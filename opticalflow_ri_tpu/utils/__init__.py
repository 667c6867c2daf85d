"""IO, timing and data utilities."""
