"""Ingestion-job specs (the reference's ``dlt_config`` surface).

Validation rules are a behavioral clone of
/root/reference/datanika/services/upload_service.py:137-241
(``validate_upload_config``) — they define the public config spec:

- modes: ``single_table`` (requires ``table``; accepts ``incremental``,
  top-level ``primary_key`` for merge) and ``full_database`` (accepts
  ``table_names`` list; merge requires per-table ``merge_config``).
- ``write_disposition`` ∈ {append, replace, merge}.
- ``incremental``: requires ``cursor_path``; optional ``initial_value``
  and ``row_order`` ∈ {asc, desc}.
- ``batch_size``: positive int (default 10 000 — dlt_runner.py:8).
- ``schema_contract``: {tables|columns|data_type} →
  {evolve|freeze|discard_value|discard_row}.
- ``filters``: list of {column, op, value} with op ∈ FILTER_OPS.

Keys NOT consumed by the engine itself are forwarded to the write
layer, mirroring how non-INTERNAL_CONFIG_KEYS pass through to
``pipeline.run()`` (dlt_runner.py:22-44,351).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.operators.filters import FILTER_OPS, FilterSpec, parse_filters
from datanika_core_spark.operators.writers import (
    CONTRACT_ENTITIES,
    CONTRACT_MODES,
    SchemaContract,
    WRITE_DISPOSITIONS,
)

VALID_MODES = ("single_table", "full_database")
VALID_ROW_ORDERS = ("asc", "desc")
DEFAULT_BATCH_SIZE = 10_000

#: Keys the engine consumes; everything else is passed through to the
#: writer options (parity: INTERNAL_CONFIG_KEYS, upload_service.py:20-29).
INTERNAL_CONFIG_KEYS = frozenset(
    {
        "mode",
        "table",
        "source_schema",
        "table_names",
        "incremental",
        "batch_size",
        "filters",
        "merge_config",
        "write_disposition",
        "primary_key",
        "schema_contract",
    }
)


def validate_upload_config(cfg: Any) -> None:
    """Raise ValidationError unless ``cfg`` is a valid dlt_config."""
    if not isinstance(cfg, dict):
        raise ValidationError("dlt_config must be a dict")
    if not cfg:
        return  # empty config is valid

    disposition = cfg.get("write_disposition")
    if disposition is not None and disposition not in WRITE_DISPOSITIONS:
        raise ValidationError(
            f"write_disposition must be one of {set(WRITE_DISPOSITIONS)},"
            f" got '{disposition}'"
        )

    mode = cfg.get("mode", "full_database")
    if mode not in VALID_MODES:
        raise ValidationError(f"mode must be one of {set(VALID_MODES)}, got '{mode}'")

    if mode == "single_table":
        if "table" not in cfg:
            raise ValidationError("single_table mode requires a 'table' field")
        if "table_names" in cfg:
            raise ValidationError("single_table mode does not accept 'table_names'")
        if "merge_config" in cfg:
            raise ValidationError("single_table mode does not accept 'merge_config'")
        if disposition == "merge" and "primary_key" not in cfg:
            raise ValidationError(
                "write_disposition 'merge' requires a 'primary_key' field"
            )
        incremental = cfg.get("incremental")
        if incremental is not None:
            if not isinstance(incremental, dict) or "cursor_path" not in incremental:
                raise ValidationError("incremental requires a 'cursor_path' field")
            row_order = incremental.get("row_order")
            if row_order is not None and row_order not in VALID_ROW_ORDERS:
                raise ValidationError(
                    f"row_order must be one of {set(VALID_ROW_ORDERS)},"
                    f" got '{row_order}'"
                )
    else:  # full_database
        if "table" in cfg:
            raise ValidationError("full_database mode does not accept 'table'")
        if "incremental" in cfg:
            raise ValidationError("full_database mode does not accept 'incremental'")
        table_names = cfg.get("table_names")
        if table_names is not None and not isinstance(table_names, list):
            raise ValidationError("table_names must be a list")
        if disposition == "merge":
            if "merge_config" not in cfg:
                raise ValidationError("full_database merge requires 'merge_config'")
            merge_config = cfg["merge_config"]
            if not isinstance(merge_config, dict):
                raise ValidationError("merge_config must be a dict")
            for table_name, table_cfg in merge_config.items():
                if not isinstance(table_cfg, dict):
                    raise ValidationError(
                        f"merge_config entry '{table_name}' must be a dict"
                    )
                if "primary_key" not in table_cfg:
                    raise ValidationError(
                        f"merge_config entry '{table_name}' requires 'primary_key'"
                    )
                pk = table_cfg["primary_key"]
                if not isinstance(pk, (str, list)):
                    raise ValidationError(
                        f"merge_config entry '{table_name}':"
                        " primary_key must be a string or list"
                    )

    batch_size = cfg.get("batch_size")
    if batch_size is not None and (
        not isinstance(batch_size, int) or isinstance(batch_size, bool) or batch_size <= 0
    ):
        raise ValidationError("batch_size must be a positive integer")

    source_schema = cfg.get("source_schema")
    if source_schema is not None and not isinstance(source_schema, str):
        raise ValidationError("source_schema must be a string")

    schema_contract = cfg.get("schema_contract")
    if schema_contract is not None:
        if not isinstance(schema_contract, dict):
            raise ValidationError("schema_contract must be a dict")
        for entity, value in schema_contract.items():
            if entity not in CONTRACT_ENTITIES:
                raise ValidationError(
                    f"schema_contract key '{entity}' not in {set(CONTRACT_ENTITIES)}"
                )
            if value not in CONTRACT_MODES:
                raise ValidationError(
                    f"schema_contract value '{value}' not in {set(CONTRACT_MODES)}"
                )

    filters = cfg.get("filters")
    if filters is not None:
        if not isinstance(filters, list):
            raise ValidationError("filters must be a list")
        for f in filters:
            if not isinstance(f, dict):
                raise ValidationError("Each filter must be a dict")
            for required in ("column", "op", "value"):
                if required not in f:
                    raise ValidationError(f"Each filter requires '{required}'")
            if f["op"] not in FILTER_OPS:
                raise ValidationError(
                    f"Filter op must be one of {set(FILTER_OPS)}, got '{f['op']}'"
                )


@dataclass(frozen=True)
class IncrementalSpec:
    """Cursor-based incremental extraction (S3 —
    dlt_runner.py:173-180)."""

    cursor_path: str
    initial_value: Any = None
    row_order: str | None = None


@dataclass
class UploadSpec:
    """A validated ingestion job: what the reference calls an Upload
    (models/upload.py:10-40) minus platform chrome (orgs, statuses)."""

    name: str
    mode: str = "full_database"
    table: str | None = None
    table_names: list[str] | None = None
    source_schema: str | None = None
    write_disposition: str = "append"
    primary_key: str | list[str] | None = None
    merge_config: dict[str, dict[str, Any]] | None = None
    incremental: IncrementalSpec | None = None
    batch_size: int = DEFAULT_BATCH_SIZE
    schema_contract: SchemaContract = field(default_factory=SchemaContract)
    filters: list[FilterSpec] = field(default_factory=list)
    passthrough: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_config(cls, name: str, cfg: Mapping[str, Any]) -> "UploadSpec":
        validate_upload_config(dict(cfg))
        inc = None
        if cfg.get("incremental"):
            raw = cfg["incremental"]
            inc = IncrementalSpec(
                cursor_path=raw["cursor_path"],
                initial_value=raw.get("initial_value"),
                row_order=raw.get("row_order"),
            )
        return cls(
            name=name,
            mode=cfg.get("mode", "full_database"),
            table=cfg.get("table"),
            table_names=cfg.get("table_names"),
            source_schema=cfg.get("source_schema"),
            write_disposition=cfg.get("write_disposition", "append"),
            primary_key=cfg.get("primary_key"),
            merge_config=cfg.get("merge_config"),
            incremental=inc,
            batch_size=cfg.get("batch_size") or DEFAULT_BATCH_SIZE,
            schema_contract=SchemaContract.parse(cfg.get("schema_contract")),
            filters=parse_filters(cfg.get("filters")),
            passthrough={
                k: v for k, v in cfg.items() if k not in INTERNAL_CONFIG_KEYS
            },
        )
