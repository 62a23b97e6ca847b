"""Synthetic pages source + catalog (checkpoint) seam."""
