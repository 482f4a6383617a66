"""CDC change-log collapse as an oracle-paired workload: a
deterministic Debezium-shaped change log is derived from `orders`
(both engines build the identical log in-query), collapsed with
operators/cdc.py::latest_state semantics, and summarized per order
status.

Log construction (all pure functions of o_orderkey, no RNG):
- seq 1: every order arrives as `insert` at its original price;
- seq 2: keys % 5 == 0 get an `update` at price × 2 (doubling is
  EXACT in binary floating point — a ×1.1 reprice rounds half-cent
  boundaries differently across engines);
- seq 3: keys % 7 == 0 get a `delete`;
- seq 4: keys % 35 == 0 get a late `update` at price 99.99 —
  resurrecting rows deleted at seq 3 (a delete is only final if
  nothing follows it), the case naive "apply deletes last" logic
  gets wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.cdc import latest_state
from datanika_core_spark.workloads import t, workload


@workload(
    "cdc_final_state_orders",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice AS price,
         1 AS seq, 'insert' AS op
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2,
         2, 'update'
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, NULL, 3, 'delete'
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, 99.99, 4, 'update'
  FROM orders WHERE o_orderkey % 35 = 0
),
final AS (
  SELECT o_orderkey, o_orderstatus, price
  FROM (
    SELECT *,
           row_number() OVER (
             PARTITION BY o_orderkey
             ORDER BY seq DESC,
                      CASE WHEN op = 'delete' THEN 0 ELSE 1 END
           ) AS rn
    FROM changes
  )
  WHERE rn = 1 AND op <> 'delete'
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       ROUND(sum(CAST(round(price * 100) AS BIGINT)) / 100.0, 2)
         AS total_price
FROM final
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def cdc_final_state_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse the synthetic 4-phase change log over orders with
    latest_state (operators/cdc.py) and summarize the surviving
    state per order status — deleted-at-seq-3 keys vanish UNLESS a
    seq-4 update resurrected them.

    Scale: the union log shuffles once on o_orderkey for the window;
    everything upstream is map-side projections of the same scan
    (Catalyst collapses the four branches into one scan + Expand)."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ins = orders.select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").alias("price"),
        F.lit(1).alias("seq"), F.lit("insert").alias("op"),
    )
    upd = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey", "o_orderstatus",
            (F.col("o_totalprice") * 2).alias("price"),
            F.lit(2).alias("seq"), F.lit("update").alias("op"),
        )
    )
    dele = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey", "o_orderstatus",
            F.lit(None).cast("double").alias("price"),
            F.lit(3).alias("seq"), F.lit("delete").alias("op"),
        )
    )
    late = (
        orders.filter(F.col("o_orderkey") % 35 == 0)
        .select(
            "o_orderkey", "o_orderstatus",
            F.lit(99.99).alias("price"),
            F.lit(4).alias("seq"), F.lit("update").alias("op"),
        )
    )
    changes = ins.unionByName(upd).unionByName(dele).unionByName(late)
    final = latest_state(changes, "o_orderkey", seq="seq", op_col="op")
    return (
        final.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # integer-cent summation: 4k+ doubles at 1e9 magnitude sum
            # with order-dependent cents drift; cents are exact
            F.round(
                F.sum(F.round(F.col("price") * 100).cast("bigint"))
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )
