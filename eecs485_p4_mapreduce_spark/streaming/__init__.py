"""Structured Streaming operators (filled in this round)."""
