"""Structured Streaming pipeline assembly (the StreamLoader analog)."""
