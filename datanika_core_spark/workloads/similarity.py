"""Similarity-search workloads — populated in Phase 4."""
