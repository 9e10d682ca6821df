"""Vectorized per-batch functions for training-data pipelines:
text analysis, deduplication, similarity search."""
