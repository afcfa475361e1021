"""Training-data text/embedding operator queries (filled in incrementally)."""
