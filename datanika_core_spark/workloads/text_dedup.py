"""Text analysis + dedup workloads — populated in Phase 4."""
