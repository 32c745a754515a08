"""Command-line entry points (train / sample)."""
