"""Command-line entry points (train / infer / eval)."""
