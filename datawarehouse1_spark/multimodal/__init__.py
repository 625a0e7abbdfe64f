"""Multimodal binary-column plumbing (decoders stubbed, Spark side real)."""
