"""Framework utilities (observability, config helpers)."""
