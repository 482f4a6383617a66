"""Source protocol: anything that yields named DataFrames."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Protocol, runtime_checkable

from pyspark.sql import DataFrame


@dataclass
class TableBatch:
    """One extracted table: name + DataFrame (+ optional pk hint)."""

    name: str
    df: DataFrame
    primary_key: object = None


@runtime_checkable
class Source(Protocol):
    """A source yields TableBatches; the ingestion job routes each to
    the writer under its per-table disposition (SURVEY.md §3.1)."""

    def tables(self) -> Iterator[TableBatch]: ...
