"""Structured Streaming layer: event-time windows, dedup, presence state."""
