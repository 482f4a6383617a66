"""Row-level quality filters with dlt-parity null semantics.

The reference applies these as Python closures per extracted row —
``FILTER_OPS`` in /root/reference/datanika/services/dlt_runner.py:46-55,
attached at :334-339, validated in upload_service.py:19,227-241. The
critical subtlety (SURVEY.md §2A) is NULL handling:

- ``eq/gt/gte/lt/lte/in``: a NULL cell makes the predicate false →
  the row is DROPPED (Python: ``None == v`` is False; ordered ops
  explicitly guard ``is not None``; ``None in [..]`` is False).
- ``ne``: ``None != v`` is True → NULL rows are KEPT.
- ``not_in``: ``None not in [..]`` is True → NULL rows are KEPT.

SQL three-valued logic drops NULLs for *every* comparison, so ``ne``
and ``not_in`` must be rewritten with an explicit ``OR col IS NULL``.

Unlike the reference (which filters *after* a full extraction, in
Python, row by row), compiling to a Spark ``Column`` lets Catalyst
push the predicate into the scan (JDBC WHERE clause / parquet
row-group skipping) — identical semantics, and at 100 TB the
difference between reading the table and not reading it.

Multiple filters AND-compose, matching chained ``add_filter`` calls
(dlt_runner.py:334-339).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datanika_core_spark.errors import ValidationError

#: op name → needs a list-valued argument?
FILTER_OPS: Mapping[str, bool] = {
    "eq": False,
    "ne": False,
    "gt": False,
    "gte": False,
    "lt": False,
    "lte": False,
    "in": True,
    "not_in": True,
}

#: ops whose reference predicate keeps NULL cells (SURVEY.md §2A table).
NULL_KEEPING_OPS = frozenset({"ne", "not_in"})


@dataclass(frozen=True)
class FilterSpec:
    """One row filter: (column, op, value).

    Wire format parity: ``dlt_config.filters`` entries
    ``{"column": c, "op": op, "value": v}``
    (upload_service.py:227-241).
    """

    column: str
    op: str
    value: Any

    def validate(self) -> "FilterSpec":
        if self.op not in FILTER_OPS:
            raise ValidationError(
                f"unknown filter op {self.op!r}; allowed: {sorted(FILTER_OPS)}"
            )
        if not self.column or not isinstance(self.column, str):
            raise ValidationError("filter requires a non-empty 'column'")
        needs_list = FILTER_OPS[self.op]
        is_list = isinstance(self.value, (list, tuple, set))
        if needs_list and not is_list:
            raise ValidationError(f"filter op {self.op!r} requires a list value")
        if not needs_list and is_list:
            raise ValidationError(f"filter op {self.op!r} requires a scalar value")
        return self

    def to_column(self) -> Column:
        """Compile to a Spark Column with reference null semantics."""
        c = F.col(self.column)
        v = self.value
        if self.op == "eq":
            return c == F.lit(v)
        if self.op == "ne":
            # Python `None != v` is True → keep NULLs.
            return (c != F.lit(v)) | c.isNull()
        if self.op == "gt":
            return c > F.lit(v)
        if self.op == "gte":
            return c >= F.lit(v)
        if self.op == "lt":
            return c < F.lit(v)
        if self.op == "lte":
            return c <= F.lit(v)
        if self.op == "in":
            return c.isin(list(v))
        if self.op == "not_in":
            # Python `None not in [...]` is True → keep NULLs.
            return ~c.isin(list(v)) | c.isNull()
        raise ValidationError(f"unknown filter op {self.op!r}")

    def python_predicate(self) -> Callable[[Mapping[str, Any]], bool]:
        """Row-level predicate identical to the reference closures —
        used by driver-side sources (REST/Mongo/Sheets) that filter
        before a DataFrame exists, and by tests as the semantic
        oracle for :meth:`to_column`."""
        col, op, val = self.column, self.op, self.value
        if op == "eq":
            return lambda row: row.get(col) == val
        if op == "ne":
            return lambda row: row.get(col) != val
        if op == "gt":
            return lambda row: row.get(col) is not None and row.get(col) > val
        if op == "gte":
            return lambda row: row.get(col) is not None and row.get(col) >= val
        if op == "lt":
            return lambda row: row.get(col) is not None and row.get(col) < val
        if op == "lte":
            return lambda row: row.get(col) is not None and row.get(col) <= val
        if op == "in":
            return lambda row: row.get(col) in val
        if op == "not_in":
            return lambda row: row.get(col) not in val
        raise ValidationError(f"unknown filter op {op!r}")


def parse_filters(raw: Sequence[Mapping[str, Any]] | None) -> list[FilterSpec]:
    """Parse + validate the ``filters`` list of a dlt_config."""
    if not raw:
        return []
    if not isinstance(raw, (list, tuple)):
        raise ValidationError("'filters' must be a list")
    return [
        FilterSpec(
            column=item.get("column", ""),
            op=item.get("op", ""),
            value=item.get("value"),
        ).validate()
        for item in raw
    ]


def apply_filters(df: DataFrame, specs: Iterable[FilterSpec]) -> DataFrame:
    """AND-compose all filters onto a DataFrame (pushdown-friendly)."""
    for spec in specs:
        df = df.filter(spec.to_column())
    return df


def filters_to_sql(specs: Iterable[FilterSpec]) -> str | None:
    """Render filters as an ANSI-SQL WHERE fragment (used for oracle
    generation and for JDBC pushdown strings). Returns None if empty."""

    def lit(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    parts = []
    for s in specs:
        c = s.column
        if s.op == "eq":
            parts.append(f"{c} = {lit(s.value)}")
        elif s.op == "ne":
            parts.append(f"({c} <> {lit(s.value)} OR {c} IS NULL)")
        elif s.op in ("gt", "gte", "lt", "lte"):
            sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}[s.op]
            parts.append(f"{c} {sym} {lit(s.value)}")
        elif s.op == "in":
            parts.append(f"{c} IN ({', '.join(lit(v) for v in s.value)})")
        elif s.op == "not_in":
            vals = ", ".join(lit(v) for v in s.value)
            parts.append(f"({c} NOT IN ({vals}) OR {c} IS NULL)")
    return " AND ".join(parts) if parts else None
