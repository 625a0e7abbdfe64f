"""Ingest sources: xlsx (the reference's input format) and parquet."""
