"""Extraction sources (the "E" of E+L).

Each source produces one or more named DataFrames from an external
system, mirroring the reference's dlt source builders
(/root/reference/datanika/services/dlt_runner.py:139-289).
"""

from datanika_core_spark.sources.base import Source, TableBatch

__all__ = ["Source", "TableBatch"]
