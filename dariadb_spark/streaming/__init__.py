"""Structured Streaming surface (subscribe, streaming current-value)."""
