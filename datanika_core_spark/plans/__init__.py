"""Transformation (SQL model) layer — the engine's replacement for the
reference's dbt projects (/root/reference/datanika/services/dbt_project.py)."""
