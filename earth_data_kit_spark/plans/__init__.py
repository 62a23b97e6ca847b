"""Checkpoint / lineage / resume."""
