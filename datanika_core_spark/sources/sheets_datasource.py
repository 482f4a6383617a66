"""Google Sheets as a Spark 4 Python DataSource — the executor-
parallel upgrade of the driver-side Sheets source (S7,
sources/sheets.py; reference: google_sheets source, one table per
worksheet tab, first row = header).

``spark.read.format("sheets_ds")`` with one input partition per
worksheet tab — a workbook's tabs fan out across executors.

Options (strings, per the DataSource contract):
- ``schema_ddl`` (required) — output schema (+ optional ``_tab``
  string column, populated with the tab name when present)
- ``tabs``       (required) — comma-separated worksheet names
- ``transport``  — "http" (public-sheet CSV export via the
  spreadsheets/d/{id}/gviz/tq?tqx=out:csv&sheet={tab} endpoint,
  stdlib urllib) | "file" (read ``{base_dir}/{tab}.csv`` — the mock
  transport for tests / captured exports)
- ``spreadsheet_id`` — for transport=http
- ``base_dir``       — for transport=file

Values are csv strings; the declared schema drives try-parse of
int/double/bool columns (blank -> NULL), matching the driver-side
source's coercion rules.
"""

from __future__ import annotations

import csv
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructType,
)


class _TabPartition(InputPartition):
    def __init__(self, tab: str):
        self.tab = tab


def _parse(value: str | None, dtype):
    if value is None or value == "":
        return None
    if isinstance(dtype, (IntegerType, LongType)):
        try:
            return int(value)
        except ValueError:
            return None
    if isinstance(dtype, (DoubleType, FloatType)):
        try:
            return float(value)
        except ValueError:
            return None
    if isinstance(dtype, BooleanType):
        # Mirror the numeric try-parse semantics: a cell outside the
        # recognized true/false vocabulary is a bad value -> NULL, not
        # False ('N/A' must not silently become False).
        v = value.strip().lower()
        if v in ("true", "1", "yes"):
            return True
        if v in ("false", "0", "no"):
            return False
        return None
    return value


class _SheetsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self.schema_ = schema
        self.options = options

    def partitions(self):
        tabs = [
            t.strip() for t in self.options["tabs"].split(",") if t.strip()
        ]
        return [_TabPartition(t) for t in tabs]

    def _csv_text(self, tab: str) -> str:
        transport = self.options.get("transport", "http")
        if transport == "file":
            path = os.path.join(self.options["base_dir"], f"{tab}.csv")
            with open(path) as f:
                return f.read()
        if transport == "http":
            from urllib.parse import quote
            from urllib.request import urlopen

            sid = self.options["spreadsheet_id"]
            url = (
                f"https://docs.google.com/spreadsheets/d/{sid}"
                f"/gviz/tq?tqx=out:csv&sheet={quote(tab)}"
            )
            with urlopen(url, timeout=30) as resp:  # noqa: S310
                return resp.read().decode()
        raise ValueError(f"unknown transport {transport!r}")

    def read(self, partition: _TabPartition):
        text = self._csv_text(partition.tab)
        rows = list(csv.reader(io.StringIO(text)))
        if not rows:
            return
        header = [h.strip() for h in rows[0]]
        idx = {h: i for i, h in enumerate(header)}
        for raw in rows[1:]:
            out = []
            for f in self.schema_.fields:
                if f.name == "_tab":
                    out.append(partition.tab)
                    continue
                i = idx.get(f.name)
                cell = raw[i] if i is not None and i < len(raw) else None
                out.append(_parse(cell, f.dataType))
            yield tuple(out)


class SheetsDataSource(DataSource):
    """format name: ``sheets_ds``"""

    @classmethod
    def name(cls) -> str:
        return "sheets_ds"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def reader(self, schema: StructType) -> _SheetsReader:
        return _SheetsReader(schema, dict(self.options))
