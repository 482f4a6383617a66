"""Runtime bloom-filter join pushdown: the 100 TB lever for
selective fact-dim joins whose dim outgrows broadcast.

When a selective filter sits on the build side of a shuffle join,
Spark injects a BloomFilterAggregate over the build keys and pushes
``might_contain`` onto the probe side's scan — probe rows that can't
match are dropped BEFORE the shuffle, which at scale is the
difference between shuffling the whole fact table and shuffling the
~matching fraction. Broadcast joins don't need it (the dim rides to
every task anyway); it exists precisely for the
dim-too-big-to-broadcast regime, so the test pins exactly that:
broadcast disabled, scan-size threshold lowered (our test files are
far below the 10 GB production default — the threshold is the only
thing standing between this plan and the real one).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.01"


def _revenue_by_brand(spark):
    li = read_table(spark, f"{SF}/lineitem.parquet")
    part = read_table(spark, f"{SF}/part.parquet").filter(
        F.col("p_brand") == "Brand#13"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def test_bloom_filter_injected_on_shuffle_join_and_result_unchanged(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
        )
    }
    try:
        # the regime runtime filters exist for: dim NOT broadcastable
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        with_filter = _revenue_by_brand(spark)
        plan = with_filter._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
        rows_on = {tuple(r) for r in with_filter.collect()}

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        no_filter = _revenue_by_brand(spark)
        plan_off = no_filter._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan_off.lower()
        rows_off = {tuple(r) for r in no_filter.collect()}

        # a runtime filter is pure pruning: results must be identical
        assert rows_on == rows_off and rows_on
    finally:
        for k, v in saved.items():
            conf.set(k, v)
