"""Reusable distributed operators: warehouse semantics, dedup families,
similarity search, ingest pipeline."""
