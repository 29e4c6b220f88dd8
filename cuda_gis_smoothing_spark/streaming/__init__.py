"""Structured Streaming: incremental ingest + neighborhood-scoped re-smoothing."""
