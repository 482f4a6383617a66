"""Model registry — the engine's analogue of the reference's
Transformation rows (/root/reference/datanika/models/transformation.py:10-37)
+ source definitions (dbt ``sources:`` YML, dbt_project.py:622-675).

A model is a named SQL body with a materialization, target schema,
column tests and (for incremental models) an incremental config.
Models are stored in this registry instead of per-tenant dbt
projects on disk; execution happens in Spark SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.naming import validate_identifier

MATERIALIZATIONS = ("view", "table", "incremental", "ephemeral")
INCREMENTAL_STRATEGIES = ("merge", "append", "delete+insert",
                           "insert_overwrite")
ON_SCHEMA_CHANGE = ("ignore", "fail", "append_new_columns", "sync_all_columns")


@dataclass
class IncrementalConfig:
    """Parity: transformation incremental_config
    (dbt_project.py:170-175, transformation_state.py:218-230)."""

    unique_key: str | list[str] | None = None
    strategy: str = "merge"
    updated_at: str | None = None
    on_schema_change: str = "ignore"
    #: required by insert_overwrite: the partition column whose
    #: batch-present values get atomically replaced (dbt-on-Spark's
    #: partition-replacing strategy — no merge shuffle, no full-table
    #: rewrite; the write cost is proportional to the touched
    #: partitions).
    partition_by: str | None = None

    def __post_init__(self):
        if self.strategy not in INCREMENTAL_STRATEGIES:
            raise ValidationError(
                f"incremental strategy must be one of {INCREMENTAL_STRATEGIES}"
            )
        if self.on_schema_change not in ON_SCHEMA_CHANGE:
            raise ValidationError(
                f"on_schema_change must be one of {ON_SCHEMA_CHANGE}"
            )
        if self.strategy == "merge" and not self.unique_key:
            raise ValidationError("merge strategy requires unique_key")
        if self.strategy == "insert_overwrite" and not self.partition_by:
            raise ValidationError(
                "insert_overwrite strategy requires partition_by"
            )


@dataclass
class ColumnTest:
    """One data test on one column (T13/T14)."""

    column: str
    test: str
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class Model:
    name: str
    sql_body: str
    materialization: str = "view"
    schema: str = "analytics"
    tags: list[str] = field(default_factory=list)
    tests: list[ColumnTest] = field(default_factory=list)
    incremental: IncrementalConfig | None = None
    description: str = ""

    def __post_init__(self):
        validate_identifier(self.name)
        validate_identifier(self.schema)
        if self.materialization not in MATERIALIZATIONS:
            raise ValidationError(
                f"materialization must be one of {MATERIALIZATIONS},"
                f" got {self.materialization!r}"
            )
        if not self.sql_body or not self.sql_body.strip():
            raise ValidationError("sql_body must be non-empty")
        if self.materialization == "incremental" and self.incremental is None:
            self.incremental = IncrementalConfig(strategy="append")

    @property
    def target(self) -> str:
        """Fully-qualified table this model materializes to. Custom
        schemas are used verbatim, not prefixed (T11 —
        generate_schema_name parity, dbt_project.py:126-137)."""
        return f"{self.schema}.{self.name}"


@dataclass
class SnapshotDef:
    """A snapshot block (T5): SQL selecting the current source state
    + SCD2 config; materializes to {target_schema}.{name}
    (dbt_project.py:529-610). ``config`` is an
    operators.scd2.SnapshotConfig."""

    name: str
    sql_body: str
    config: Any
    target_schema: str = "snapshots"

    def __post_init__(self):
        validate_identifier(self.name)
        validate_identifier(self.target_schema)
        if not self.sql_body or not self.sql_body.strip():
            raise ValidationError("snapshot sql_body must be non-empty")

    @property
    def target(self) -> str:
        return f"{self.target_schema}.{self.name}"


@dataclass
class Seed:
    """A CSV seed (dbt seed): file loaded as {schema}.{name}."""

    name: str
    path: str
    schema: str = "seeds"

    def __post_init__(self):
        validate_identifier(self.name)
        validate_identifier(self.schema)

    @property
    def target(self) -> str:
        return f"{self.schema}.{self.name}"


class ModelRegistry:
    """name → Model, plus source() name mapping, snapshots and
    seeds (the full dbt-project node surface, T1-T8)."""

    def __init__(self):
        self._models: dict[str, Model] = {}
        self._sources: dict[tuple[str, str], str] = {}
        self._snapshots: dict[str, SnapshotDef] = {}
        self._seeds: dict[str, Seed] = {}

    # -- models --
    def add(self, model: Model) -> Model:
        self._models[model.name] = model
        return model

    def get(self, name: str) -> Model:
        if name not in self._models:
            raise ValidationError(f"unknown model {name!r}")
        return self._models[name]

    def __contains__(self, name: str) -> bool:
        return name in self._models

    def names(self) -> list[str]:
        return sorted(self._models)

    def models(self) -> list[Model]:
        return [self._models[n] for n in self.names()]

    def remove(self, name: str) -> None:
        self._models.pop(name, None)

    # -- sources (dbt source() defs, T16) --
    def add_source(self, source_name: str, table: str, physical: str) -> None:
        """Map source('source_name','table') → physical table."""
        self._sources[(source_name, table)] = physical

    def resolve_source(self, source_name: str, table: str) -> str:
        key = (source_name, table)
        if key not in self._sources:
            raise ValidationError(
                f"unknown source ('{source_name}', '{table}')"
            )
        return self._sources[key]

    def sources(self) -> Mapping[tuple[str, str], str]:
        return dict(self._sources)

    # -- snapshots (T5) --
    def add_snapshot(self, snap: SnapshotDef) -> SnapshotDef:
        self._snapshots[snap.name] = snap
        return snap

    def snapshots(self) -> list[SnapshotDef]:
        return [self._snapshots[n] for n in sorted(self._snapshots)]

    # -- seeds (dbt seed) --
    def add_seed(self, seed: Seed) -> Seed:
        self._seeds[seed.name] = seed
        return seed

    def seeds(self) -> list[Seed]:
        return [self._seeds[n] for n in sorted(self._seeds)]

    # -- source YML analogue (T16) --
    def sources_manifest(self) -> dict[str, dict[str, str]]:
        """The engine's equivalent of generated dbt ``sources:`` YML
        (dbt_project.py:622-675): source name → {table: physical}."""
        out: dict[str, dict[str, str]] = {}
        for (src, tbl), physical in sorted(self._sources.items()):
            out.setdefault(src, {})[tbl] = physical
        return out
