"""Operator library: interval joins, as-of joins, coordinate sort, dedup,
cluster resolution, similarity search, skew tools, sampling, text analysis,
multimodal plumbing."""
