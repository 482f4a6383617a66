"""Event-stream workloads (sessionization/windows) — populated in
Phase 4."""
