"""Relational + pipeline operators (filters, writers, incremental,
SCD2, dedup, similarity, text, multimodal)."""
