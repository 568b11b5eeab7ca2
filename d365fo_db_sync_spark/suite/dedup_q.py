"""Placeholder — filled in as the suite widens."""
