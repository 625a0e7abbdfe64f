"""Composed analytical plans (multi-operator pipelines)."""
