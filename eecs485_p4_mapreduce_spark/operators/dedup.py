"""dedup operators (filled in incrementally this round)."""
