"""multimodal operators (filled in incrementally this round)."""
