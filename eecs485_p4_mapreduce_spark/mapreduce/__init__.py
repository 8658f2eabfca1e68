"""Exe-compat MapReduce path (filled in this round)."""
