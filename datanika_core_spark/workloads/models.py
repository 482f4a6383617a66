"""SQL-model-layer workloads (materializations/tests/SCD2) —
populated in Phase 2."""
