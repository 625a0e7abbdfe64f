"""Structured Streaming analogs of the reference's polling ingest loop."""
