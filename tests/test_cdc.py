"""CDC apply: change-log collapse semantics + writer integration
(upsert/delete round-trip through TableWriter's dispositions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.cdc import apply_cdc, latest_state
from datanika_core_spark.operators.writers import TableWriter, drop_table


def _log(spark):
    rows = [
        # key 1: insert then update -> survives with v=20
        (1, 1, "insert", 10.0),
        (1, 2, "update", 20.0),
        # key 2: insert then delete -> gone
        (2, 1, "insert", 10.0),
        (2, 2, "delete", None),
        # key 3: delete then late re-insert -> survives with v=33
        (3, 1, "insert", 10.0),
        (3, 2, "delete", None),
        (3, 3, "update", 33.0),
        # key 4: same-seq race: delete wins over the update
        (4, 1, "insert", 10.0),
        (4, 2, "update", 40.0),
        (4, 2, "delete", None),
        # key 5: insert only
        (5, 1, "insert", 50.0),
    ]
    return spark.createDataFrame(
        rows, "k bigint, seq int, op string, v double"
    )


def test_latest_state_semantics(spark):
    got = {
        (r.k, r.v) for r in latest_state(_log(spark), "k").collect()
    }
    assert got == {(1, 20.0), (3, 33.0), (5, 50.0)}


def test_latest_state_keeps_other_columns_drops_bookkeeping(spark):
    out = latest_state(_log(spark), "k")
    assert set(out.columns) == {"k", "v"}


def test_apply_cdc_roundtrip(spark):
    writer = TableWriter(spark)
    table = "t_cdc_target"
    drop_table(spark, table)
    try:
        # seed the target with keys 1, 2 at stale values + key 9
        # untouched by the log
        seed = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (9, 9.0)], "k bigint, v double"
        )
        writer.write(seed, table, "replace")

        n_up, n_del = apply_cdc(writer, _log(spark), table, "k")
        assert n_up == 3  # keys 1, 3, 5
        assert n_del == 2  # keys 2, 4

        got = {
            (r.k, r.v)
            for r in spark.table(table).select("k", "v").collect()
        }
        # 1 updated, 2 deleted, 3 resurrected, 4 deleted (same-seq
        # delete precedence), 5 inserted, 9 untouched
        assert got == {(1, 20.0), (3, 33.0), (5, 50.0), (9, 9.0)}
    finally:
        drop_table(spark, table)


# -- property-based: latest_state vs a Python fold ----------------------


def _python_latest_state(rows):
    """Reference collapse: per key, max (seq, delete-first) wins."""
    best = {}
    for k, seq, op, v in rows:
        # delete outranks non-delete at equal seq -> rank deletes higher
        rank = (seq, 1 if op == "delete" else 0)
        if k not in best or rank > best[k][0]:
            best[k] = (rank, op, v)
    return {
        k: v for k, (rank, op, v) in best.items() if op != "delete"
    }


def test_latest_state_random_logs(spark):
    from hypothesis import given, settings, strategies as st

    ops = st.sampled_from(["insert", "update", "delete"])
    row = st.tuples(
        st.integers(min_value=0, max_value=6),   # key (collisions likely)
        st.integers(min_value=1, max_value=5),   # seq (ties likely)
        ops,
        st.integers(min_value=0, max_value=99),  # value
    )

    @settings(max_examples=20, deadline=None)
    @given(st.lists(row, min_size=1, max_size=25))
    def check(rows):
        # at equal (key, seq) with MULTIPLE non-delete ops the winner
        # among them is unspecified (row_number tie) — keep one
        # non-delete candidate per (key, seq) so expectations are
        # well-defined, while delete-vs-nondelete ties stay in scope
        seen = {}
        filtered = []
        for r in rows:
            k, seq, op, v = r
            if op != "delete":
                if (k, seq) in seen:
                    continue
                seen[(k, seq)] = True
            filtered.append(r)
        df = spark.createDataFrame(
            filtered, "k bigint, seq int, op string, v int"
        )
        got = {r.k: r.v for r in latest_state(df, "k").collect()}
        want = _python_latest_state(filtered)
        assert got == want

    check()
