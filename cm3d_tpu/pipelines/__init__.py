"""End-to-end pipeline drivers (CLI entry points)."""
