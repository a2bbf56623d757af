"""Command-line entry points (reference CLI flag names preserved)."""
