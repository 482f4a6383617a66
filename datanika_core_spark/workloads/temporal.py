"""Temporal-join workloads: as-of join and interval/range join over
the `events` table (beyond-reference family — the reference has no
temporal operators; SURVEY.md §2B delegates all SQL to warehouses).

Oracles use DuckDB's native ASOF JOIN / inequality joins; the Spark
side uses `operators/temporal.py` (single-shuffle union+window as-of;
bucketed-equi range join). Same conventions as the rest of the
corpus: identical aliases both sides, rounded doubles, total-order
sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.temporal import asof_join, range_join
from datanika_core_spark.workloads import t, workload


@workload(
    "asof_join_click_purchase",
    headline=True,
    oracle="""
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id < 40) c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
""",
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the latest prior-or-equal
    purchase of the same user (kdb `aj` / pandas merge_asof shape).

    Spark implementation: union + windowed last-non-null — ONE
    shuffle on user_id, linear, no point-in-time self-join blowup.
    Clicks with no prior purchase keep NULLs (ASOF LEFT semantics).
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 40)
    ).select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["purchase_value"],
        # clicks cover <10% of the key domain: semi-prune purchases
        # so the firehose side never enters the union shuffle
        prune_right=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    ).orderBy("event_id")


@workload(
    "asof_join_tolerance_session",
    oracle="""
SELECT s.user_id,
       count(*) AS n_errors,
       count(CASE WHEN p.ts IS NOT NULL
                   AND floor(epoch(s.ts)) - floor(epoch(p.ts)) <= 172800 THEN 1 END)
         AS n_with_recent_signup
FROM (SELECT * FROM events WHERE event_type = 'error') s
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') p
  ON s.user_id = p.user_id AND s.ts >= p.ts
GROUP BY s.user_id
ORDER BY s.user_id
""",
)
def asof_join_tolerance_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 48 h tolerance: errors matched to a signup at most
    48 h earlier. Oracle counts non-null matched ts after applying the
    same tolerance (epoch-diff filter on the ASOF match).
    """
    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("value").alias("signup_value")
    )
    joined = asof_join(
        errors,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="signup_ts",
        right_cols=["signup_value"],
        tolerance_seconds=48 * 3600,
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count("signup_ts").alias("n_with_recent_signup"),
        )
        .orderBy("user_id")
    )


@workload(
    "range_join_purchase_context",
    headline=True,
    oracle="""
SELECT p.event_id AS purchase_id,
       count(e.event_id) AS n_context_events,
       round(sum(e.value), 2) AS context_value
FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 60) p
LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL 2 HOUR
 AND e.ts < p.ts
GROUP BY p.event_id
ORDER BY p.event_id
""",
)
def range_join_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: for every purchase, the events of the same user
    in the 2 h window before it. DuckDB runs the inequality join
    natively (IEJoin); vanilla Spark would pick a nested-loop plan, so
    the operator buckets time (1 h buckets, fan-out ≤ 3) and
    equi-joins on (user_id, bucket) before the exact containment
    filter — shuffled hash join, linear at 100 TB.
    """
    ev = t(spark, sf_dir, "events")
    purchases = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 60))
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("win_start"),
            F.col("ts").alias("win_end"),
        )
    )
    context = ev.select(
        "user_id", "ts", F.col("event_id").alias("ctx_id"), F.col("value").alias("ctx_value")
    )
    joined = range_join(
        context,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_start="win_start",
        right_end="win_end",
        bucket_seconds=3600,
        end_inclusive=False,
    )
    matched = joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_context_events"),
        F.round(F.sum("ctx_value"), 2).alias("context_value"),
    )
    # LEFT semantics: purchases with zero context events still appear.
    return (
        purchases.select("purchase_id")
        .join(matched, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce("n_context_events", F.lit(0)).alias("n_context_events"),
            "context_value",
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# Point-in-time (PIT) join: facts against SCD2 validity intervals.
# --------------------------------------------------------------------------


@workload(
    "pit_join_scd2_dim",
    headline=True,
    oracle="""
WITH dim AS (
  SELECT o_orderkey, o_totalprice AS dim_price,
         CAST(1 AS BIGINT) AS version,
         o_orderdate AS valid_from,
         CASE WHEN o_orderkey % 7 = 0
              THEN o_orderdate + INTERVAL 30 DAY END AS valid_to
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice * 1.05 AS dim_price,
         CAST(2 AS BIGINT) AS version,
         o_orderdate + INTERVAL 30 DAY AS valid_from,
         NULL AS valid_to
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT d.version, l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(d.dim_price), 2) AS dim_price_total
FROM lineitem l
JOIN dim d
  ON l.l_orderkey = d.o_orderkey
 AND l.l_shipdate >= d.valid_from
 AND (d.valid_to IS NULL OR l.l_shipdate < d.valid_to)
GROUP BY d.version, l.l_returnflag
ORDER BY version, l_returnflag
""",
)
def pit_join_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each lineitem picks the order-dimension
    VERSION that was valid at its ship date (SCD2 validity
    intervals — same versioning as model_scd2_snapshot_orders). The
    plan is an equi-join on the surrogate key with the interval
    predicate as residual condition — one shuffle on o_orderkey, and
    at scale both sides bucket by the key so the join co-locates;
    never a cross product. This is how facts consume the SCD2 tables
    the snapshot runner maintains."""
    orders = t(spark, sf_dir, "orders")
    v1 = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("dim_price"),
        F.lit(1).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.when(F.col("o_orderkey") % 7 == 0,
               F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .alias("valid_to"),
    )
    v2 = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.05).alias("dim_price"),
        F.lit(2).cast("bigint").alias("version"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    joined = li.join(
        dim,
        (li.l_orderkey == dim.o_orderkey)
        & (li.l_shipdate >= dim.valid_from)
        & (dim.valid_to.isNull() | (li.l_shipdate < dim.valid_to)),
    )
    return (
        joined.groupBy("version", "l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.sum("dim_price"), 2).alias("dim_price_total"),
        )
        .orderBy("version", "l_returnflag")
    )


# --------------------------------------------------------------------------
# Binned interval-overlap self-join — the interval x interval
# companion to the point-in-interval range join above: week-bucket
# blocking + exact verify + the later-start dedup rule, the standard
# way to run an overlap join at 100 TB without an all-pairs scan.
# --------------------------------------------------------------------------

_IOV_TOPK = 20


@workload(
    "interval_overlap_supplier_transit",
    oracle=f"""
WITH iv AS (
  SELECT l_suppkey AS s,
         l_orderkey AS ok, l_linenumber AS ln,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS lo,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           + CAST(l_quantity AS INT) % 28 + 1 AS hi
  FROM lineitem
),
pairs AS (
  SELECT a.s, count(*) AS n_pairs
  FROM iv a JOIN iv b
    ON b.s = a.s
   AND (a.ok < b.ok OR (a.ok = b.ok AND a.ln < b.ln))
   AND a.lo <= b.hi AND b.lo <= a.hi
  GROUP BY a.s
),
ship AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n_shipments FROM iv GROUP BY s
)
SELECT p.s AS suppkey, sh.n_shipments,
       CAST(p.n_pairs AS BIGINT) AS n_overlap_pairs,
       CAST(row_number() OVER (ORDER BY p.n_pairs DESC, p.s) AS BIGINT)
         AS rank
FROM pairs p JOIN ship sh ON sh.s = p.s
QUALIFY rank <= {_IOV_TOPK}
ORDER BY rank
""",
)
def interval_overlap_supplier_transit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval x interval overlap self-join: per supplier, how many
    pairs of shipments were IN TRANSIT simultaneously (transit
    window = ship day + a deterministic quantity-derived duration —
    the synthetic stand-in for receiptdate, identical in both
    engines). The operational question is fleet/dock contention; the
    operator is the generic overlap join the point-in-interval range
    join can't express.

    The 100 TB shape (and the reason this isn't a DuckDB-style
    inequality join on Spark): each interval EXPLODES to the
    epoch-weeks it spans, candidates meet on the (supplier, week)
    equi-key, the exact overlap predicate verifies, and each
    overlapping pair is COUNTED EXACTLY ONCE with the later-start
    rule — a pair is attributed only to the week containing
    max(lo_a, lo_b), which both intervals provably cover, so no
    DISTINCT materialization of the pair set is ever needed. Block
    fan-out is |intervals per supplier-week| — bounded by business
    reality, not corpus size; the oracle cross-checks with a direct
    inequality join (fine at sf0.01, exactly what doesn't scale).

    All arithmetic is integer days; counts are BIGINT."""
    from pyspark.sql import Window as _W

    li = t(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_suppkey").alias("s"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
        .alias("lo"),
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
            + F.col("l_quantity").cast("int") % 28 + 1
        ).alias("hi"),
    )
    binned = iv.select(
        "s", "ok", "ln", "lo", "hi",
        F.explode(
            F.sequence(
                F.expr("lo div 7"), F.expr("hi div 7")
            )
        ).alias("wk"),
    )
    a = binned.select(
        "s", "wk",
        F.col("ok").alias("ok_a"), F.col("ln").alias("ln_a"),
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
    )
    b = binned.select(
        "s", "wk",
        F.col("ok").alias("ok_b"), F.col("ln").alias("ln_b"),
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
    )
    pairs = (
        a.join(b, ["s", "wk"])
        .filter(
            (
                (F.col("ok_a") < F.col("ok_b"))
                | ((F.col("ok_a") == F.col("ok_b"))
                   & (F.col("ln_a") < F.col("ln_b")))
            )
            & (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a"))
            # later-start dedup: exactly one week block owns the pair
            & (F.col("wk") == F.expr("greatest(lo_a, lo_b) div 7"))
        )
        .groupBy("s")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    ship = iv.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shipments")
    )
    ranked = (
        pairs.join(ship, "s")
        .withColumn(
            "rank",
            F.row_number().over(
                _W.orderBy(F.col("n_pairs").desc(), "s")
            ).cast("bigint"),
        )
    )
    return (
        ranked.filter(F.col("rank") <= _IOV_TOPK)
        .select(
            F.col("s").alias("suppkey"),
            "n_shipments",
            F.col("n_pairs").alias("n_overlap_pairs"),
            "rank",
        )
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# Interval-union coverage: merged in-transit days per supplier
# (round 8) — the union-length companion of the overlap join above.
# --------------------------------------------------------------------------

_IUC_TOPK = 20


@workload(
    "interval_union_coverage",
    oracle=f"""
WITH iv AS (
  SELECT l_suppkey AS s, l_orderkey AS ok, l_linenumber AS ln,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS lo,
         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           + CAST(l_quantity AS INT) % 28 + 1 AS hi
  FROM lineitem
),
flagged AS (
  SELECT s, lo, hi, ok, ln,
         CASE WHEN lo > max(hi) OVER (
             PARTITION BY s ORDER BY lo, ok, ln
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  -- SAME ordering key (lo, ok, ln) as the flag window: with any
  -- other key (e.g. lo, hi) a tie at an island boundary can place
  -- the flagged row after an unflagged twin, attributing the twin
  -- to the previous island and bridging a genuine coverage gap
  SELECT s, lo, hi,
         sum(new_island) OVER (
             PARTITION BY s ORDER BY lo, ok, ln
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM flagged
),
merged AS (
  SELECT s, isl,
         CAST(max(hi) - min(lo) + 1 AS BIGINT) AS cov
  FROM islands GROUP BY s, isl
),
per_s AS (
  SELECT m.s,
         CAST(count(*) AS BIGINT) AS n_islands,
         CAST(sum(m.cov) AS BIGINT) AS covered_days
  FROM merged m GROUP BY m.s
),
meta AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n_shipments,
         CAST(max(hi) - min(lo) + 1 AS BIGINT) AS span_days
  FROM iv GROUP BY s
)
SELECT p.s AS suppkey, meta.n_shipments, p.n_islands,
       p.covered_days, meta.span_days,
       ROUND(p.covered_days * 1.0 / meta.span_days, 6) AS utilization,
       CAST(row_number() OVER (ORDER BY p.covered_days DESC, p.s)
            AS BIGINT) AS rank
FROM per_s p JOIN meta ON meta.s = p.s
QUALIFY rank <= {_IUC_TOPK}
ORDER BY rank
""",
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION length per supplier: how many distinct calendar
    days had at least one shipment in transit (same synthetic
    transit window as interval_overlap_supplier_transit), plus the
    merged-busy-period count and span utilization — the classic
    sweep-line union-of-intervals aggregate (uptime, occupancy,
    SLA-coverage) that neither an overlap join nor a plain groupBy
    expresses.

    Plan: ONE window pass per supplier — an interval starts a new
    island when its lo exceeds the running max(hi) of all earlier
    intervals (ties touch → merge, intervals are inclusive days);
    island ids are a running sum of those flags; each island
    contributes max(hi)−min(lo)+1 days. All arithmetic is integer
    days, so the engines agree bit-for-bit.

    Scale: windows partition by supplier (the natural key, millions
    of small partitions — no global sort, no skew beyond business
    reality); island merge is a groupBy on (supplier, island). The
    explode-to-weeks trick the overlap join needs is unnecessary
    here because union length is a per-supplier linear sweep."""
    from pyspark.sql import Window as _W

    li = t(spark, sf_dir, "lineitem")
    epoch_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    iv = li.select(
        F.col("l_suppkey").alias("s"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        epoch_days.alias("lo"),
        (
            epoch_days
            + F.col("l_quantity").cast("int") % 28 + F.lit(1)
        ).alias("hi"),
    )
    wprev = (
        _W.partitionBy("s").orderBy("lo", "ok", "ln")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "s", "lo", "hi", "ok", "ln",
        F.when(F.col("lo") > F.max("hi").over(wprev), 1)
        .otherwise(0).alias("new_island"),
    )
    # the island-id running sum MUST use the same ordering key as
    # the flag window — a different key (e.g. lo, hi) mis-attributes
    # tie-at-boundary rows to the previous island (see oracle note)
    wisl = (
        _W.partitionBy("s").orderBy("lo", "ok", "ln")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "s", "lo", "hi", F.sum("new_island").over(wisl).alias("isl")
    )
    merged = islands.groupBy("s", "isl").agg(
        (F.max("hi") - F.min("lo") + 1).cast("bigint").alias("cov")
    )
    per_s = merged.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("cov").cast("bigint").alias("covered_days"),
    )
    meta = iv.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shipments"),
        (F.max("hi") - F.min("lo") + 1).cast("bigint").alias("span_days"),
    )
    joined = per_s.join(meta, "s").select(
        F.col("s").alias("suppkey"), "n_shipments", "n_islands",
        "covered_days", "span_days",
        F.round(
            F.col("covered_days") * 1.0 / F.col("span_days"), 6
        ).alias("utilization"),
    )
    wr = _W.orderBy(F.col("covered_days").desc(), F.col("suppkey"))
    return (
        joined.withColumn(
            "rank", F.row_number().over(wr).cast("bigint")
        )
        .filter(F.col("rank") <= _IUC_TOPK)
        .orderBy("rank")
    )
