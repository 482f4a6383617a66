"""Entity resolution + data reconciliation (beyond-reference,
SURVEY.md §7 Phase 4): blocked fuzzy record linkage and a keyed
table diff — the two workhorses of ELT data-quality work.

- `entity_fuzzy_match` is the canonical record-linkage shape:
  **block, then compare**. Candidate pairs come from an equi-join on
  a cheap blocking key (here: 2-char name prefix), so the quadratic
  edit-distance comparison runs only within blocks — the same
  pattern as every dedup operator in this repo (LSH bands, simhash
  blocks, IVF clusters). Levenshtein is a JVM built-in on both
  engines, bit-identical by definition (it's integer DP).
- `table_diff_keyed` is dbt-audit-helper-style reconciliation: one
  full-outer join on the key classifies every row as added / removed
  / changed (with the exact changed-column list) — the check you run
  after a migration, a backfill, or a merge-strategy change. One
  shuffle on the key; at 100 TB both sides bucket by the key and the
  join is co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.workloads import t, workload

_LEV_MAX = 2


@workload(
    "entity_fuzzy_match",
    oracle=f"""
WITH clean AS (
  SELECT p_partkey, p_name FROM part
), dirty AS (
  SELECT p_partkey + 10000 AS dirty_id,
         substring(p_name, 1, 2) || substring(p_name, 4) AS name
  FROM part WHERE p_partkey % 10 = 0
), cand AS (
  SELECT d.dirty_id, d.name, c.p_partkey, c.p_name,
         levenshtein(d.name, c.p_name) AS dist
  FROM dirty d JOIN clean c
    ON substring(d.name, 1, 2) = substring(c.p_name, 1, 2)
  WHERE levenshtein(d.name, c.p_name) <= {_LEV_MAX}
)
SELECT dirty_id, p_partkey AS matched_key, p_name AS matched_name,
       CAST(dist AS BIGINT) AS dist
FROM (
  SELECT *, row_number() OVER (PARTITION BY dirty_id
                               ORDER BY dist, p_partkey) AS rn
  FROM cand
) WHERE rn = 1
ORDER BY dirty_id
""",
)
def entity_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: a dirty batch (every 10th part name
    with its 3rd character deleted) links back to the clean entity
    table via 2-char-prefix blocking + Levenshtein <= 2, best match
    per dirty record (min distance, then min key). The edit distance
    runs only inside blocks — never the cross product."""
    from pyspark.sql import Window

    clean = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    dirty = clean.filter(F.col("p_partkey") % 10 == 0).select(
        (F.col("p_partkey") + 10000).alias("dirty_id"),
        F.concat(
            F.substring("p_name", 1, 2),
            F.expr("substring(p_name, 4)"),
        ).alias("name"),
    )
    cand = (
        dirty.join(
            clean,
            F.substring(dirty.name, 1, 2) == F.substring(clean.p_name, 1, 2),
        )
        .withColumn("dist", F.levenshtein("name", "p_name"))
        .filter(F.col("dist") <= _LEV_MAX)
    )
    w = Window.partitionBy("dirty_id").orderBy("dist", "p_partkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dirty_id",
            F.col("p_partkey").alias("matched_key"),
            F.col("p_name").alias("matched_name"),
            F.col("dist").cast("bigint").alias("dist"),
        )
        .orderBy("dirty_id")
    )


_DIFF_COLS = ("o_orderstatus", "o_totalprice", "o_orderpriority")


@workload(
    "table_diff_keyed",
    oracle=f"""
WITH left_t AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
), right_t AS (
  SELECT o_orderkey,
         o_orderstatus,
         CASE WHEN o_orderkey % 50 = 0
              THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice
         END AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 100 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT coalesce(l.o_orderkey, r.o_orderkey) AS key,
       CASE WHEN l.o_orderkey IS NULL THEN 'added'
            WHEN r.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CASE WHEN l.o_orderkey IS NULL OR r.o_orderkey IS NULL
            THEN ''
            ELSE array_to_string(list_filter([
              {", ".join(
                  f"CASE WHEN NOT (l.{c} IS NOT DISTINCT FROM r.{c}) "
                  f"THEN '{c}' END" for c in _DIFF_COLS)}
            ], x -> x IS NOT NULL), ',') END AS changed_cols
FROM left_t l FULL OUTER JOIN right_t r USING (o_orderkey)
WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL
   OR {" OR ".join(
       f"NOT (l.{c} IS NOT DISTINCT FROM r.{c})" for c in _DIFF_COLS)}
ORDER BY key
""",
)
def table_diff_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed table diff (audit-helper shape): orders vs a mutated
    copy (every 100th row dropped, every 50th repriced +10%, every
    97th duplicated under a new key). ONE full-outer join on the key
    emits added / removed / changed rows with the exact changed
    column list; unchanged rows are filtered out so the report is
    proportional to the drift, not the table."""
    left = t(spark, sf_dir, "orders").select(
        "o_orderkey", *_DIFF_COLS
    )
    right = (
        left.filter(F.col("o_orderkey") % 100 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 50 == 0,
                   F.round(F.col("o_totalprice") * 1.1, 2))
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            left.filter(F.col("o_orderkey") % 97 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10000000
            )
        )
    )
    l = left.alias("l")
    r = right.alias("r")
    joined = l.join(r, F.col("l.o_orderkey") == F.col("r.o_orderkey"),
                    "full_outer")
    l_null = F.col("l.o_orderkey").isNull()
    r_null = F.col("r.o_orderkey").isNull()
    diffs = [
        ~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in _DIFF_COLS
    ]
    any_diff = diffs[0]
    for d in diffs[1:]:
        any_diff = any_diff | d
    changed_cols = F.filter(
        F.array(*[
            F.when(~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")), F.lit(c))
            for c in _DIFF_COLS
        ]),
        lambda x: x.isNotNull(),
    )
    return (
        joined.filter(l_null | r_null | any_diff)
        .select(
            F.coalesce(F.col("l.o_orderkey"), F.col("r.o_orderkey"))
            .alias("key"),
            F.when(l_null, "added")
            .when(r_null, "removed")
            .otherwise("changed").alias("status"),
            # serialized (not array<string>): the driver harness
            # canonicalizes via pandas factorize, which cannot hash
            # list cells — a comma-joined string is order-stable
            # (column order is the fixed _DIFF_COLS order both sides)
            F.when(l_null | r_null, F.lit(""))
            .otherwise(F.array_join(changed_cols, ","))
            .alias("changed_cols"),
        )
        .orderBy("key")
    )
