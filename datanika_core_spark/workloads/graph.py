"""Graph analytics over event streams (beyond-reference, SURVEY.md §7
Phase 4): weighted PageRank on the event-type transition graph.

The two halves have opposite scale profiles, which is the point:

- **Edge extraction is the heavy, distributed half**: consecutive
  event pairs per user via a lag window (one shuffle on user_id — the
  same partitioning sessionization uses), filtered to a 30-minute
  gap, then reduced to (src, dst, weight) transition counts with
  map-side combine. At 100 TB this is the whole cost.
- **The iterative solve runs on the reduced graph**: transition
  matrices over type-level (or domain-level, topic-level, …)
  vocabularies are tiny relative to the event log, so three unrolled
  PageRank iterations are three broadcast-join + aggregate rounds.
  For billion-node graphs the same joins work with the rank vector as
  a bucketed table instead of a broadcast — the plan shape (join rank
  onto edges on src, aggregate contributions by dst) is unchanged.

Determinism: ranks are doubles but every per-node contribution sum
has ≤ |V| terms with both engines using the same formula text; the
6-dp output rounding absorbs summation-order drift (same policy as
every float aggregate in the corpus). Dangling-node mass is
redistributed uniformly, exactly as in the canonical formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.workloads import t, workload

_PR_D = 0.85     # damping
_PR_ITERS = 3
_PR_GAP_MIN = 30


def _o_pr_iter(prev: str, idx: int) -> str:
    """One PageRank iteration as DuckDB CTE text: contributions from
    `prev` joined onto edges, dangling mass from no-out-edge nodes,
    uniform teleport."""
    return f"""
dang{idx} AS (
  SELECT coalesce(sum(p.pr), 0.0) AS dmass
  FROM {prev} p LEFT JOIN outw o ON p.node = o.src
  WHERE o.src IS NULL
),
contrib{idx} AS (
  SELECT e.dst AS node, sum(p.pr * e.w / o.total_w) AS c
  FROM edges e
  JOIN {prev} p ON p.node = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
pr{idx} AS (
  SELECT n.node,
         (1.0 - {_PR_D}) / nn.n
         + {_PR_D} * (coalesce(c.c, 0.0) + d.dmass / nn.n) AS pr
  FROM nodes n
  CROSS JOIN nn CROSS JOIN dang{idx} d
  LEFT JOIN contrib{idx} c ON c.node = n.node
)"""


_O_PR_CHAIN = ",".join(
    _o_pr_iter(f"pr{i - 1}" if i > 1 else "pr0", i)
    for i in range(1, _PR_ITERS + 1)
)


@workload(
    "pagerank_event_transitions",
    headline=True,
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM seq
  WHERE prev_type IS NOT NULL
    AND ts <= prev_ts + INTERVAL {_PR_GAP_MIN} MINUTE
  GROUP BY prev_type, event_type
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS total_w
         FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
{_O_PR_CHAIN}
SELECT node AS event_type, round(pr, 6) AS pagerank
FROM pr{_PR_ITERS}
ORDER BY event_type
""",
)
def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 3 iterations, dangling mass
    redistributed) over the session-gap event-type transition graph.
    Edge extraction = ONE user_id shuffle + lag window + counted
    groupBy; each iteration = join rank onto edges (broadcast — the
    reduced graph is small) + aggregate contributions by dst."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    edges = (
        seq.filter(
            F.col("prev_type").isNotNull()
            & (F.col("ts") <= F.col("prev_ts")
               + F.expr(f"INTERVAL {_PR_GAP_MIN} MINUTES"))
        )
        .groupBy(F.col("prev_type").alias("src"),
                 F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    # The reduced graph feeds every iteration: cache it so the event
    # log is scanned ONCE, not once per iteration (at corpus scale,
    # persist nodes/edges to a table instead — same principle).
    edges = edges.cache()
    nodes = ev.select(F.col("event_type").alias("node")).distinct().cache()
    n = nodes.count()
    outw = edges.groupBy("src").agg(
        F.sum("w").cast("bigint").alias("total_w")
    )
    edges = edges.join(outw, "src")

    # nodes without out-edges never change: resolve the dangling set
    # once instead of re-deriving it with a left-anti join per
    # iteration.
    no_out = nodes.join(
        outw, nodes.node == outw.src, "left_anti"
    ).cache()

    pr = nodes.withColumn("pr", F.lit(1.0) / F.lit(float(n)))
    for it in range(_PR_ITERS):
        dang = (
            pr.join(F.broadcast(no_out), "node", "left_semi")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dmass"))
        )
        contrib = (
            edges.join(F.broadcast(pr), edges.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("total_w"))
                 .alias("c"))
        )
        pr = (
            nodes.join(F.broadcast(dang))
            .join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit((1.0 - _PR_D) / n)
                 + F.lit(_PR_D)
                 * (F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("dmass") / F.lit(float(n)))).alias("pr"),
            )
        )
        if it < _PR_ITERS - 1:
            # truncate lineage between iterations (the rank vector is
            # |V| rows): keeps the final plan one-iteration deep
            # instead of exponentially re-deriving earlier rounds in
            # every broadcast branch — same pattern as
            # connected_components' localCheckpoint loop.
            pr = pr.localCheckpoint(eager=True)
    return (
        pr.select(F.col("node").alias("event_type"),
                  F.round("pr", 6).alias("pagerank"))
        .orderBy("event_type")
    )


@workload(
    "markov_next_event",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM seq
  WHERE prev_type IS NOT NULL
    AND ts <= prev_ts + INTERVAL {_PR_GAP_MIN} MINUTE
  GROUP BY prev_type, event_type
),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS total_w
         FROM edges GROUP BY src)
SELECT e.src, e.dst, e.w,
       round(e.w * 1.0 / o.total_w, 6) AS p,
       CAST(row_number() OVER (PARTITION BY e.src
                               ORDER BY e.w DESC, e.dst) AS BIGINT)
         AS rank_within_src
FROM edges e JOIN outw o USING (src)
ORDER BY src, rank_within_src
""",
)
def markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event table: P(dst | src) over the
    same session-gap transition edges PageRank consumes, with each
    source's successors ranked by probability — the "what does a
    user do next" readout. The heavy half is the one lag-window
    shuffle; the conditional table is a tiny grouped division."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    edges = (
        seq.filter(
            F.col("prev_type").isNotNull()
            & (F.col("ts") <= F.col("prev_ts")
               + F.expr(f"INTERVAL {_PR_GAP_MIN} MINUTES"))
        )
        .groupBy(F.col("prev_type").alias("src"),
                 F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    outw = edges.groupBy("src").agg(
        F.sum("w").cast("bigint").alias("total_w")
    )
    wr = Window.partitionBy("src").orderBy(F.col("w").desc(), "dst")
    return (
        edges.join(F.broadcast(outw), "src")
        .select(
            "src", "dst", "w",
            F.round(F.col("w") * 1.0 / F.col("total_w"), 6).alias("p"),
            F.row_number().over(wr).cast("bigint")
            .alias("rank_within_src"),
        )
        .orderBy("src", "rank_within_src")
    )
