"""Structured-Streaming operators (tumbling windows, late data)."""
