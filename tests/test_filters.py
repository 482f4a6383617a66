"""Filter-op null-semantics parity: the Spark Column compilation must
agree row-for-row with the reference's Python closures
(/root/reference/datanika/services/dlt_runner.py:46-55)."""

from __future__ import annotations

import pytest

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.operators.filters import (
    FilterSpec,
    apply_filters,
    filters_to_sql,
    parse_filters,
)

ROWS = [
    {"id": 1, "status": "active", "score": 10.0},
    {"id": 2, "status": "paused", "score": None},
    {"id": 3, "status": None, "score": 5.0},
    {"id": 4, "status": "active", "score": 7.5},
    {"id": 5, "status": "error", "score": None},
]

CASES = [
    FilterSpec("status", "eq", "active"),
    FilterSpec("status", "ne", "active"),
    FilterSpec("score", "gt", 6.0),
    FilterSpec("score", "gte", 7.5),
    FilterSpec("score", "lt", 8.0),
    FilterSpec("score", "lte", 5.0),
    FilterSpec("status", "in", ["active", "paused"]),
    FilterSpec("status", "not_in", ["active", "paused"]),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(r["id"], r["status"], r["score"]) for r in ROWS],
        "id int, status string, score double",
    )


@pytest.mark.parametrize("spec", CASES, ids=lambda s: f"{s.column}-{s.op}")
def test_spark_matches_python_closure(spec, df):
    expected = {r["id"] for r in ROWS if spec.python_predicate()(r)}
    got = {row.id for row in apply_filters(df, [spec]).collect()}
    assert got == expected


def test_null_keeping_ops_keep_nulls(df):
    ne = apply_filters(df, [FilterSpec("status", "ne", "active")])
    assert 3 in {r.id for r in ne.collect()}  # NULL status kept
    ni = apply_filters(df, [FilterSpec("status", "not_in", ["active"])])
    assert 3 in {r.id for r in ni.collect()}
    eq = apply_filters(df, [FilterSpec("status", "eq", "active")])
    assert 3 not in {r.id for r in eq.collect()}  # NULL dropped


def test_filters_and_compose(df):
    specs = [
        FilterSpec("status", "ne", "error"),
        FilterSpec("score", "gt", 6.0),
    ]
    expected = {
        r["id"]
        for r in ROWS
        if all(s.python_predicate()(r) for s in specs)
    }
    got = {row.id for row in apply_filters(df, specs).collect()}
    assert got == expected


def test_sql_rendering_matches_semantics(df, spark):
    specs = [
        FilterSpec("status", "not_in", ["error"]),
        FilterSpec("score", "gte", 5.0),
    ]
    frag = filters_to_sql(specs)
    df.createOrReplaceTempView("f_rows")
    got = {r.id for r in spark.sql(f"SELECT id FROM f_rows WHERE {frag}").collect()}
    expected = {
        r["id"] for r in ROWS if all(s.python_predicate()(r) for s in specs)
    }
    assert got == expected


def test_parse_validation():
    assert parse_filters(None) == []
    ok = parse_filters([{"column": "a", "op": "in", "value": [1, 2]}])
    assert ok[0].op == "in"
    with pytest.raises(ValidationError):
        parse_filters([{"column": "a", "op": "between", "value": 1}])
    with pytest.raises(ValidationError):
        parse_filters([{"column": "a", "op": "in", "value": 1}])
    with pytest.raises(ValidationError):
        parse_filters([{"column": "a", "op": "eq", "value": [1]}])
    with pytest.raises(ValidationError):
        parse_filters([{"column": "", "op": "eq", "value": 1}])
