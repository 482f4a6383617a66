"""Salted-join skew mitigation: result parity with the plain join and
actual spread of a hot key across salt buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed_facts(spark):
    # 5000 rows for hot key 1, a handful for keys 2..50
    hot = spark.range(5000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(2, 51).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(1, 51).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("k_name"),
    )


def test_salted_inner_join_matches_plain(spark, skewed_facts, dim):
    plain = skewed_facts.join(dim, "k").select("k", "payload", "k_name")
    salted = salted_join(skewed_facts, dim, "k").select("k", "payload", "k_name")
    assert salted.columns == plain.columns
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_salted_left_join_keeps_unmatched(spark, skewed_facts, dim):
    facts_plus = skewed_facts.unionByName(
        spark.createDataFrame([(999, 1)], "k bigint, payload bigint")
    )
    plain = facts_plus.join(dim, "k", "left")
    salted = salted_join(facts_plus, dim, "k", how="left")
    assert salted.count() == plain.count()
    unmatched = salted.filter(F.col("k") == 999).collect()
    assert len(unmatched) == 1 and unmatched[0].k_name is None


def test_hot_key_spreads_over_salts(spark, skewed_facts, dim):
    """The mechanism, not just the result: the hot key's rows must
    occupy many distinct salt buckets so no single reducer gets them
    all."""
    n_salts = 16
    salted = skewed_facts.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed_facts.columns]),
            F.lit(n_salts),
        ),
    )
    buckets = (
        salted.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert buckets == n_salts

    # deterministic: same salt assignment on re-evaluation
    a = salted.select("k", "payload", "__salt").collect()
    b = salted.select("k", "payload", "__salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_unsupported_how_raises(skewed_facts, dim):
    with pytest.raises(ValueError):
        salted_join(skewed_facts, dim, "k", how="full")
