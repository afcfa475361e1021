"""VRL stdlib function queries (filled in incrementally)."""
