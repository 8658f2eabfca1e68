"""similarity operators (filled in incrementally this round)."""
