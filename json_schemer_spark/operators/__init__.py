"""Table-level validation and corpus-curation operators: stats,
uniqueness, referential, drift, dedup, similarity, text analysis, web/URL
filtering, multimodal probes, deterministic sampling, sequence packing."""
