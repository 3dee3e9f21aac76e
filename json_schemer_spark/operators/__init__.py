"""Table-level validation operators: stats, uniqueness, referential,
drift, dedup, similarity, text analysis."""
