"""Structured Streaming layer (the reference's watcher daemon analog)."""
