"""Relational + extension operators built on the DataFrame API."""
