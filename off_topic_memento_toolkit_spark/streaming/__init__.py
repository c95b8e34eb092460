"""Structured Streaming surface (incremental ingest + streaming dedup)."""
