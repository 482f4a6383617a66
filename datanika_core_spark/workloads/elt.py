"""E+L semantics workloads (filters/merge/incremental/contracts) —
populated in Phase 1."""
