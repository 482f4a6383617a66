"""Approximation self-measurement for the two sketch operators the
engine substitutes at 100 TB scale:

- ``approx_count_distinct`` (HyperLogLog++) for COUNT(DISTINCT) — a
  mergeable fixed-size sketch instead of a distinct shuffle of every
  value;
- ``percentile_approx`` (a mergeable quantile sketch) for exact
  ``percentile`` — map-side partial sketches instead of a per-group
  sort.

The docstrings across the repo (length_percentile_filter,
winsorize_event_values, corpus_source_stats) claim "swap in the
approx variant at 100 TB"; these tests make the claim's cost
concrete by MEASURING the error of the swap on real data at the
relative-error settings we'd deploy with. Exact twins double as the
oracle, mirroring ann_ivf_recall_eval / dedup_lsh_recall_eval.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.01"


def _events(spark):
    return read_table(spark, f"{SF}/events.parquet")


def _docs(spark):
    return read_table(spark, f"{SF}/documents.parquet")


def test_hll_distinct_users_within_advertised_error(spark):
    """HLL++ at rsd=0.01 vs exact COUNT(DISTINCT user_id) per
    event_type: relative error must hold within ~3x the advertised
    rsd (rsd is one standard deviation, not a hard bound)."""
    both = (
        _events(spark)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        )
        .collect()
    )
    assert len(both) > 0
    for row in both:
        rel = abs(row["approx"] - row["exact"]) / max(row["exact"], 1)
        assert rel <= 0.03, (
            f"{row['event_type']}: exact={row['exact']} "
            f"approx={row['approx']} rel_err={rel:.4f}"
        )


def test_hll_sketches_merge_across_partitions(spark):
    """The property that makes HLL the scale path: the union of
    per-group sketches equals (approximately) the sketch of the
    union — global distinct from per-partition partials, no second
    pass over raw data."""
    ev = _events(spark)
    global_approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("a")
    ).collect()[0]["a"]
    global_exact = ev.agg(F.countDistinct("user_id").alias("e")).collect()[
        0
    ]["e"]
    rel = abs(global_approx - global_exact) / max(global_exact, 1)
    assert rel <= 0.03


def test_percentile_approx_bounds_exact_rank(spark):
    """percentile_approx(accuracy=10000) vs exact percentile of
    token counts per language: the approx answer must land within
    1/accuracy-rank-fraction of the exact value's neighborhood —
    checked as a small relative value error on this distribution."""
    lens = _docs(spark).select(
        "lang",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "n_toks"
        ),
    )
    rows = (
        lens.groupBy("lang")
        .agg(
            F.expr("percentile(n_toks, 0.95)").alias("exact"),
            F.expr("percentile_approx(n_toks, 0.95, 10000)").alias(
                "approx"
            ),
        )
        .collect()
    )
    assert len(rows) > 0
    for row in rows:
        rel = abs(row["approx"] - row["exact"]) / max(row["exact"], 1)
        # integer-valued distribution: the sketch may sit one value
        # off at a quantile boundary; anything beyond ~5% is a bug
        assert rel <= 0.05, (
            f"{row['lang']}: exact={row['exact']} approx={row['approx']}"
        )


def test_percentile_approx_multiquantile_monotone(spark):
    """The multi-quantile form returns one sorted array per group —
    the single-pass replacement for N exact percentile sorts (the
    shape winsorize_event_values would use at scale)."""
    rows = (
        _events(spark)
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile_approx(value, array(0.01, 0.5, 0.99), 10000)"
            ).alias("qs")
        )
        .collect()
    )
    assert len(rows) > 0
    for row in rows:
        q01, q50, q99 = row["qs"]
        assert q01 <= q50 <= q99


def test_tdigest_export_shape(spark):
    """The exported digest must be a partition of the k=256 sample
    (weights sum to k), with the k1 scale function's signature
    cluster sizing: tail centroids narrow, median centroids wide."""
    from datanika_core_spark.workloads import load_all

    reg = load_all()
    rows = (
        reg["quantile_tdigest_export"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert sum(r.weight for r in rows) == 256
    # centroid ids are distinct, ordered, within [0, 16]
    ids = [r.centroid for r in rows]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert all(0 <= c <= 16 for c in ids)
    # value ranges are disjoint and ordered (it's a partition of the
    # sorted sample)
    for prev, cur in zip(rows, rows[1:]):
        assert prev.v_max <= cur.v_min
    # k1 sizing: both extreme clusters are strictly smaller than the
    # largest middle cluster
    mid_max = max(r.weight for r in rows[2:-2])
    assert rows[0].weight < mid_max and rows[-1].weight < mid_max
