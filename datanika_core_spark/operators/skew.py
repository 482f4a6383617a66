"""Skew mitigation for hot-key joins — salting.

A hash-partitioned equi-join sends every row of a key to ONE reducer;
a hot key (power-law user, null-ish default, celebrity document)
turns that reducer into the straggler that defines job wall-clock.
Two mitigations exist in this engine:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin``), enabled
   by default in ``session.build_spark`` — post-shuffle, Spark splits
   oversized partitions and replicates the matching build side. This
   is the zero-code path and handles sort-merge joins.
2. Explicit salting (this module) — pre-shuffle redistribution for
   cases AQE can't fix: aggregation-free hot keys feeding a
   *broadcast-ineligible* join, or deterministic plans where runtime
   re-planning is off (e.g. streaming micro-batches, where AQE does
   not apply).

``salted_join`` spreads each fact-side key over ``n_salts``
sub-partitions by hashing the whole fact row, and replicates the
(small-side) dimension row ``n_salts`` times — turning one hot
reducer into ``n_salts`` even ones at the cost of an ``n_salts``-way
explode of the other side. Use when the right side is small-ish but
above the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on``, salted ``n_salts`` ways.

    The skewed side gets a deterministic salt from hashing ALL its
    columns (stable across retries/reruns — no ``rand()``); the other
    side is exploded once per salt value so every (key, salt) bucket
    still finds its match. Join keys become (key..., salt): the
    shuffle spreads a hot key over ``n_salts`` reducers.

    Result is column-identical to ``skewed.join(other, on, how)``.
    Supports inner/left joins (the salt is an implementation column,
    dropped on output).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)),
    )
    replicated = other.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return salted.join(replicated, [*keys, _SALT], how).drop(_SALT)
