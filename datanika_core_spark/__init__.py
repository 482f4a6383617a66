"""datanika_core_spark — a PySpark-native analytics/ELT engine.

A from-scratch re-expression of the capabilities of
datanika-io/datanika-core (an ELT pipeline platform built on dlt +
dbt + Celery; see /root/reference) as a single Spark-native engine:

- **E+L**: Spark readers (files / JDBC / driver-side API sources),
  write dispositions append/replace/merge, incremental cursor state,
  schema contracts, row-level quality filters with dlt-parity null
  semantics.
- **T**: a registered-SQL-model layer (ref()/source() resolution,
  view/table/incremental/ephemeral/snapshot materializations, data
  tests, freshness) executed by Spark SQL / Catalyst.
- **Orchestration**: run ledger, dependency gating, cron schedules,
  hooks, backup — thin metadata around Spark jobs.
- **Scale extensions**: dedup (exact/MinHash-LSH/SimHash/n-gram),
  similarity search, text analysis, multimodal column plumbing,
  Structured Streaming over event tables.

Everything is DataFrame/Spark-SQL composition — no custom Catalyst
rules are required (see SURVEY.md §4).
"""

from datanika_core_spark.session import EngineSession

__version__ = "0.1.0"

__all__ = ["EngineSession", "__version__"]
