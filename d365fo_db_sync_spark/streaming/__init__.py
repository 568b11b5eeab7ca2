"""Structured Streaming surface (filled in with the CDC wrapper)."""
