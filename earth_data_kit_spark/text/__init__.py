"""Pinned text pipeline: extraction, geocoding, analysis (pure python)."""
