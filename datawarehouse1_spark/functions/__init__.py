"""Scalar/vector helper expressions shared by queries and operators."""
