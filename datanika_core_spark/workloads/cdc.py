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


# --------------------------------------------------------------------------
# Order-insensitive table content fingerprint (xor-folded row hashes).
# --------------------------------------------------------------------------

#: Engine-portable per-row content hash: md5 of the canonical field
#: string, first 15 hex chars as a BIGINT (< 2^60, always positive,
#: so the xor fold never touches the sign bit). Same md5 parity
#: machinery as operators/minhash.py::spark_hash_expr.
_FP_ROW = ("concat(cast(o_orderkey as string), '|',"
           " cast(cast(round(o_totalprice * 100) as bigint) as string),"
           " '|', o_orderpriority)")
_S_FP = (f"cast(conv(substring(md5({_FP_ROW}),1,15),16,10) as bigint)")
_O_FP_ROW = ("CAST(o_orderkey AS VARCHAR) || '|' ||"
             " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)"
             " || '|' || o_orderpriority")
_O_FP = f"('0x'||substring(md5({_O_FP_ROW}),1,15))::BIGINT"


@workload(
    "table_fingerprint_xor",
    oracle=f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor({_O_FP}) AS BIGINT) AS fingerprint
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def table_fingerprint_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint per order-status
    partition: every row hashes its canonical field string (md5 →
    60-bit BIGINT) and the partition fingerprint is the XOR fold of
    the row hashes plus a row count — the cheap replica-comparison /
    migration-validation primitive that answers "are these two
    copies of the table identical?" WITHOUT sorting or shuffling
    either side (compare |partitions| fingerprint rows instead of
    100 TB of rows; cf. table_diff_keyed, which is the expensive
    row-level diagnosis you run only on partitions whose
    fingerprints disagree).

    Scale: XOR is an abelian group fold — partial fingerprints
    map-side combine, the shuffle carries one row per (partition,
    task), and the fingerprint is INCREMENTALLY maintainable: xor-ing
    a changed row's old hash back out and its new hash in updates
    the fingerprint in O(delta), the same additive-view discipline
    as ivm_additive_rollup. Count defends against the xor blind spot
    (a row appearing an even number of times cancels out).
    Determinism: md5 is bit-identical on both engines; cents
    snapping makes the price field integer-exact."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderstatus", F.expr(_S_FP).alias("h")
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").cast("bigint").alias("fingerprint"),
        )
        .orderBy("o_orderstatus")
    )
