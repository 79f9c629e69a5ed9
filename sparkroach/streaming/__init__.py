"""Structured Streaming operators beyond the chain-ingest plane."""
