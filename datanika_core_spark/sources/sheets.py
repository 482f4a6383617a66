"""Google Sheets source (S7).

Reference: one resource per worksheet via gspread
``get_all_records()``, replace disposition per sheet-named table
(google_sheets_source.py:12-38, dlt_runner.py:240-260).

The gspread client is injectable (absent in this container); the
worksheet→DataFrame semantics are what the engine owns and tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql import SparkSession

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.naming import to_snake_case
from datanika_core_spark.sources.base import TableBatch


@dataclass
class GoogleSheetsSource:
    spark: SparkSession
    spreadsheet_url: str
    sheet_names: list[str] | None = None
    client: Any = None  # injectable gspread-like client

    #: write disposition for sheet tables is always replace
    disposition = "replace"

    def _spreadsheet(self):
        if self.client is None:
            raise ValidationError(
                "Sheets source requires an injected client (gspread not bundled)"
            )
        return self.client.open_by_url(self.spreadsheet_url)

    def tables(self) -> Iterator[TableBatch]:
        ss = self._spreadsheet()
        sheets = ss.worksheets()
        wanted = set(self.sheet_names) if self.sheet_names else None
        for ws in sheets:
            if wanted is not None and ws.title not in wanted:
                continue
            records = ws.get_all_records()
            if not records:
                continue
            df = self.spark.createDataFrame(records)
            yield TableBatch(to_snake_case(ws.title), df)
