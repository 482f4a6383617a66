"""Ingestion job executor — the engine's analogue of
``DltRunnerService.execute`` (/root/reference/datanika/services/
dlt_runner.py:291-356) + the upload-task glue (§3.1).

Flow per extracted table: filters (pushdown) → incremental cursor →
schema contract → disposition write → rows accounting. Dataset
naming is ``to_snake_case(upload name)`` (K2); per-table merge hints
follow merge_config (W4); row counts exclude internal ``_dlt_*``
tables (W7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from datanika_core_spark.naming import to_snake_case, validate_identifier
from datanika_core_spark.operators.filters import apply_filters
from datanika_core_spark.operators.flatten import is_internal_table
from datanika_core_spark.operators.incremental import (
    CursorStateStore,
    apply_incremental,
)
from datanika_core_spark.operators.writers import TableWriter, WriteResult
from datanika_core_spark.session import EngineSession
from datanika_core_spark.sources.base import Source
from datanika_core_spark.specs import UploadSpec


@dataclass
class UploadRunResult:
    dataset: str
    rows_loaded: int  # excludes _dlt_* internal tables (W7)
    table_results: list[WriteResult] = field(default_factory=list)


class IngestionJob:
    """Run one UploadSpec against a Source into the warehouse."""

    def __init__(self, engine: EngineSession, state_store: CursorStateStore):
        self.engine = engine
        self.writer = TableWriter(engine.spark)
        self.state = state_store

    def run(self, spec: UploadSpec, source: Source) -> UploadRunResult:
        dataset = validate_identifier(to_snake_case(spec.name))
        self.engine.ensure_database(dataset)

        wanted = None
        if spec.mode == "single_table":
            wanted = {spec.table}
        elif spec.table_names:
            wanted = set(spec.table_names)

        results: list[WriteResult] = []
        commits = []
        for batch in source.tables():
            if wanted is not None and batch.name not in wanted:
                continue
            df = apply_filters(batch.df, spec.filters)

            disposition = spec.write_disposition
            pk = spec.primary_key or batch.primary_key
            if spec.mode == "full_database" and spec.merge_config is not None:
                # W4: only tables listed in merge_config merge; the
                # rest fall back to append regardless of the top-level
                # disposition (dlt_runner.py:341-349).
                if batch.name in spec.merge_config:
                    disposition = "merge"
                    pk = spec.merge_config[batch.name]["primary_key"]
                else:
                    disposition = "append"
                    pk = None

            precedence = None
            if spec.incremental is not None and spec.mode == "single_table":
                inc = apply_incremental(
                    df, spec.incremental, self.state, dataset, batch.name
                )
                df, commit = inc.df, inc.commit
                # The cursor is the batch's natural precedence: a
                # catch-up run spanning several source days re-extracts
                # MULTIPLE versions of the same primary key in one
                # batch, and the merge must keep only the newest-cursor
                # row (dlt's last-value-wins; pinned by the restore-
                # from-backup seam test in tests/test_elt_scenario.py).
                precedence = inc.cursor_column
            else:
                commit = None

            target = f"{dataset}.{batch.name}"
            res = self.writer.write(
                df,
                target,
                disposition=disposition,
                primary_key=pk,
                contract=spec.schema_contract,
                precedence_col=precedence,
            )
            results.append(res)
            if commit is not None:
                commits.append(commit)

        # Persist cursor state only after every load succeeded
        # (exactly-once-ish semantics across failed runs, like dlt).
        for commit in commits:
            commit()

        rows = sum(
            r.rows_loaded
            for r in results
            if not is_internal_table(r.table.split(".")[-1])
        )
        return UploadRunResult(dataset, rows, results)
