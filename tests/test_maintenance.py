"""Warehouse maintenance: compaction shrinks file count without
changing data; ANALYZE populates catalog stats the CBO reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.maintenance import (
    _table_files,
    analyze_table,
    compact_partitioned_table,
    compact_table,
)
from datanika_core_spark.operators.writers import drop_table


def test_compaction_shrinks_files_preserves_data(spark):
    drop_table(spark, "t_frag")
    # simulate months of micro-batch appends: 40 tiny files
    spark.range(2000).repartition(40).withColumn(
        "v", F.col("id") * 2
    ).write.format("parquet").saveAsTable("t_frag")
    before = {tuple(r) for r in spark.table("t_frag").collect()}

    res = compact_table(spark, "t_frag", target_file_bytes=64 * 1024 * 1024)
    assert res.files_before >= 40
    assert res.files_after < res.files_before
    assert res.files_after == 1  # 2000 rows ≪ 64 MB target

    after = {tuple(r) for r in spark.table("t_frag").collect()}
    assert after == before
    drop_table(spark, "t_frag")


def test_compaction_can_grow_file_count(spark):
    drop_table(spark, "t_onefile")
    spark.range(10000).coalesce(1).write.format("parquet").saveAsTable(
        "t_onefile"
    )
    res = compact_table(spark, "t_onefile", target_file_bytes=8 * 1024)
    assert res.files_before == 1
    assert res.files_after > 1
    assert spark.table("t_onefile").count() == 10000
    drop_table(spark, "t_onefile")


def test_analyze_table_populates_stats(spark):
    drop_table(spark, "t_stats")
    spark.range(500).withColumn("k", F.col("id") % 7).write.format(
        "parquet"
    ).saveAsTable("t_stats")
    analyze_table(spark, "t_stats", columns=["k"])
    desc = {
        r[0]: r[1]
        for r in spark.sql("DESCRIBE TABLE EXTENDED t_stats").collect()
    }
    assert "Statistics" in desc and "rows" in desc["Statistics"]
    col = spark.sql("DESCRIBE EXTENDED t_stats k").collect()
    got = {r[0]: r[1] for r in col}
    assert got.get("distinct_count") == "7"
    drop_table(spark, "t_stats")


def test_compact_partitioned_table_rewrites_only_fragmented(spark):
    from datanika_core_spark.operators.maintenance import (
        _table_files,
        compact_partitioned_table,
    )
    from datanika_core_spark.operators.writers import drop_table

    drop_table(spark, "part_frag")
    base = spark.createDataFrame(
        [(i, "p%d" % (i % 3), i * 10) for i in range(30)],
        "id int, part string, v int",
    )
    base.repartition(F.col("part")).write.partitionBy("part").mode(
        "overwrite"
    ).saveAsTable("part_frag")
    # fragment ONLY p1 with several tiny appends
    for lo in (100, 200, 300):
        spark.createDataFrame(
            [(lo, "p1", lo)], "id int, part string, v int"
        ).write.partitionBy("part").mode("append").saveAsTable("part_frag")
    before = {p for p, _ in _table_files(spark, "part_frag") if "part=p0" in p}
    n_rows = spark.table("part_frag").count()

    res = compact_partitioned_table(spark, "part_frag", "part",
                                    max_files_per_partition=1)
    assert res.partitions_compacted == ["p1"]
    assert res.files_after < res.files_before
    # data intact
    assert spark.table("part_frag").count() == n_rows
    # p1 now a single file; p0's files untouched (same paths)
    files = _table_files(spark, "part_frag")
    assert sum(1 for p, _ in files if "part=p1" in p) == 1
    after = {p for p, _ in files if "part=p0" in p}
    assert after == before
    drop_table(spark, "part_frag")


def test_compact_ivf_posting_lists_roundtrip(spark):
    """The real consumer of partition-aware compaction: incremental
    IVF updates fragment the cid partitions; compaction coalesces
    them and probes still work (int partition column)."""
    from datanika_core_spark.operators.ann_store import IVFIndexStore
    from datanika_core_spark.workloads.similarity import _vectors

    for t in ("ivf_cmp_t", "ivf_cmp_t__centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    vecs = _vectors(spark, "/root/testdata/sf0.001").select("vec_id", "v")
    store = IVFIndexStore(spark, "ivf_cmp_t", k=4, iters=1)
    store.train(vecs)
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        store.update(vecs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ))
    res = compact_partitioned_table(spark, "ivf_cmp_t", "cid",
                                    max_files_per_partition=1)
    assert res.files_after < res.files_before
    assert spark.table("ivf_cmp_t").count() == vecs.count()
    q = vecs.limit(1).collect()[0]
    out = store.probe([(int(q.vec_id), list(q.v))], topk=2).collect()
    assert out[0].vec_id == q.vec_id


# -- Z-order clustering ---------------------------------------------------


def _file_stats(spark, table, cols):
    """Per-file min/max of each col → average normalized range width
    (1.0 = every file spans the whole domain, ~1/n_files = perfectly
    clustered)."""
    from pyspark.sql import functions as F

    df = spark.table(table).withColumn("_f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    per_file = df.groupBy("_f").agg(*aggs).collect()
    dom = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    widths = {}
    for c in cols:
        span = float(dom[f"hi_{c}"]) - float(dom[f"lo_{c}"]) or 1.0
        widths[c] = sum(
            (float(r[f"hi_{c}"]) - float(r[f"lo_{c}"])) / span
            for r in per_file
        ) / len(per_file)
    return widths, len(per_file)


def test_zorder_shrinks_file_ranges_on_both_columns(spark):
    from pyspark.sql import functions as F

    from datanika_core_spark.operators.maintenance import zorder_table
    from datanika_core_spark.operators.writers import drop_table
    from datanika_core_spark.session import read_table

    table = "t_zorder_events"
    drop_table(spark, table)
    try:
        ev = read_table(
            spark, "/root/testdata/sf0.01/events.parquet"
        ).select("event_id", "user_id", "value")
        # unclustered baseline: round-robin spread over 8 files
        ev.repartition(8).write.format("parquet").saveAsTable(table)
        before, n_before = _file_stats(spark, table, ["user_id", "value"])
        assert n_before > 1

        res = zorder_table(
            spark, table, ["user_id", "value"],
            target_file_bytes=40_000,  # keep several output files
        )
        after, n_after = _file_stats(spark, table, ["user_id", "value"])
        assert n_after > 1
        # round-robin files each span ~the full domain (~1.0);
        # z-ordered files must cover strictly narrower ranges on BOTH
        # dimensions — that narrowing IS the data-skipping win
        assert after["user_id"] < before["user_id"] * 0.8
        assert after["value"] < before["value"] * 0.8
        # row content unchanged by the rewrite
        assert spark.table(table).count() == ev.count()
        assert res.columns == ["user_id", "value"]
    finally:
        drop_table(spark, table)


def test_zorder_equidepth_balances_skewed_column(spark):
    from pyspark.sql import functions as F

    from datanika_core_spark.operators.maintenance import zorder_table
    from datanika_core_spark.operators.writers import drop_table

    from pyspark.sql import Window

    def rank_span(table, col, n_rows):
        """Average per-file span of `col` in RANK space (fraction of
        the empirical CDF each file covers) — the pruning-quality
        metric that is insensitive to the value scale."""
        df = (
            spark.table(table)
            .withColumn("_f", F.input_file_name())
            .withColumn(
                "_r",
                F.row_number().over(Window.orderBy(col, "k")) / n_rows,
            )
        )
        per_file = (
            df.groupBy("_f")
            .agg((F.max("_r") - F.min("_r")).alias("span"))
            .collect()
        )
        return sum(r.span for r in per_file) / len(per_file), len(per_file)

    # heavily skewed key: exp(uniform) -> long right tail
    base = spark.range(20000).select(
        F.col("id").alias("k"),
        F.exp(F.rand(seed=7) * 8).alias("skewed"),
        (F.rand(seed=11) * 100).alias("other"),
    )
    for mode in ("linear", "equidepth"):
        table = f"t_zorder_{mode}"
        drop_table(spark, table)
        base.write.format("parquet").saveAsTable(table)
        zorder_table(
            spark, table, ["skewed", "other"],
            target_file_bytes=60_000, quantize=mode,
        )
    try:
        span_lin, n_lin = rank_span("t_zorder_linear", "skewed", 20000)
        span_eq, n_eq = rank_span("t_zorder_equidepth", "skewed", 20000)
        assert n_lin > 1 and n_eq > 1
        # linear codes collapse the exp-distributed mass onto a few
        # low code values, so the skewed column barely clusters (each
        # file spans a wide slice of its CDF); equidepth codes give
        # equal mass per code and must cluster it measurably tighter
        assert span_eq < span_lin * 0.8, (span_eq, span_lin)
        assert spark.table("t_zorder_equidepth").count() == 20000
    finally:
        drop_table(spark, "t_zorder_linear")
        drop_table(spark, "t_zorder_equidepth")


def test_advise_recommends_compaction_then_none(spark):
    from pyspark.sql import functions as F

    from datanika_core_spark.operators.maintenance import (
        advise,
        compact_table,
    )
    from datanika_core_spark.operators.writers import drop_table

    table = "t_advise"
    drop_table(spark, table)
    try:
        spark.range(50_000).select(
            "id", (F.rand(seed=3) * 10).alias("v")
        ).repartition(32).write.format("parquet").saveAsTable(table)
        before = advise(spark, table, target_file_bytes=1_000_000)
        assert before.recommendation == "compact"
        assert before.n_files > 1

        compact_table(spark, table, target_file_bytes=1_000_000)
        after = advise(spark, table, target_file_bytes=1_000_000)
        assert after.recommendation == "none"
        assert spark.table(table).count() == 50_000
    finally:
        drop_table(spark, table)


def test_advise_shuffle_partitions(spark):
    from datanika_core_spark.operators.maintenance import (
        advise_shuffle_partitions,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS maint")
    drop_table(spark, "maint.shuffle_t")
    spark.range(0, 10000).selectExpr("id", "id * 2 AS v") \
        .write.mode("overwrite").saveAsTable("maint.shuffle_t")
    cores = spark.sparkContext.defaultParallelism

    # tiny table -> floor at one full wave
    a = advise_shuffle_partitions(spark, "maint.shuffle_t")
    assert a.recommended_partitions == cores
    assert a.input_bytes > 0

    # force a small target so the recommendation exceeds a wave, and
    # check full-wave rounding
    b = advise_shuffle_partitions(
        spark, "maint.shuffle_t", target_partition_bytes=1024
    )
    assert b.recommended_partitions % cores == 0
    assert b.recommended_partitions * 1024 >= b.input_bytes

    # expansion scales the estimate monotonically
    c = advise_shuffle_partitions(
        spark, "maint.shuffle_t", target_partition_bytes=1024,
        expansion=4.0,
    )
    assert c.recommended_partitions >= b.recommended_partitions


def test_zorder_skipping_workload_dominates_trailing_dim(spark):
    """The measurement workload must reproduce the layout trade it
    exists to price: lexicographic is near-perfect on the leading
    key and useless on the trailing one; z-order must beat
    lexicographic on the trailing dim by a wide margin while keeping
    substantial skipping on the leading dim."""
    from datanika_core_spark.workloads import load_all

    rows = {
        (r.layout, r.dim): r.est_skip_frac
        for r in load_all()["zorder_file_skipping"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    }
    assert rows[("lexicographic", "l_partkey")] > 0.9
    assert rows[("lexicographic", "l_suppkey")] < 0.05
    assert rows[("zorder", "l_suppkey")] > 0.5
    assert rows[("zorder", "l_partkey")] > 0.5
    # the whole point: min skipping across dims is what a mixed
    # query workload sees, and z-order must win it decisively
    zmin = min(rows[("zorder", d)] for d in ("l_partkey", "l_suppkey"))
    lmin = min(rows[("lexicographic", d)] for d in ("l_partkey", "l_suppkey"))
    assert zmin > lmin + 0.5
