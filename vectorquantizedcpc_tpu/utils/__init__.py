"""Utilities: profiling and observability helpers."""
