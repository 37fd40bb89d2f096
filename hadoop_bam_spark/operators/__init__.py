"""Operator library: interval joins, coordinate sort, dedup, similarity,
text analysis, multimodal plumbing."""
