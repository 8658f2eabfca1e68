"""textstats operators (filled in incrementally this round)."""
