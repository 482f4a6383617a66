"""Storage-block hygiene for checkpoint/cache-using operators.

``localCheckpoint(eager=True)`` pins RDD blocks for the life of the
SparkSession unless explicitly unpersisted. Two leak shapes matter:

- **Iterative loops** (PageRank, connected components, BPE merges,
  PQ Lloyd rounds) that checkpoint per round would pin
  O(iterations) block sets. :class:`RollingCheckpoint` frees round
  N-1's blocks the moment round N is materialized — storage stays
  O(1) in iterations.
- **Long sessions** running many independent queries (the bench's 37
  headline queries, the correctness driver's 200-query sweep)
  accumulate O(queries) block sets; at sf0.1 on a default-size local
  driver heap that starved a broadcast build (the round-5 bench
  ``Not enough memory to build and broadcast`` OOM).
  :func:`release_blocks` is the consumer-side sweep: call it AFTER
  fully executing one query's result and BEFORE building the next.

SAFETY NOTE — localCheckpoint blocks are NOT recomputable (lineage
is truncated; that is the point). Releasing them is only safe once
every plan that references them has finished executing. ``.cache()``
blocks are recomputable, so releasing those merely costs a re-scan.

At 100 TB the same discipline applies verbatim: executor storage
memory is a shared budget, and a pipeline that pins every
intermediate for the life of the session evicts its own shuffle and
broadcast working set. Reference parity: the reference engine
(datanika/services/dlt_runner.py) holds no cross-query state at all —
each run's temp tables die with the run — so bounded block lifetime
is the Spark-native equivalent of its hygiene.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently holding storage blocks (cache,
    persist, and localCheckpoint all land here)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keys()}


def unpersist_rdd_ids(
    spark: SparkSession, ids: Iterable[int], blocking: bool = False
) -> int:
    """Unpersist the given RDD ids (missing ids are ignored).
    Returns how many were actually released."""
    want = set(int(i) for i in ids)
    if not want:
        return 0
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for k in list(jmap.keys()):
        if int(k) in want:
            jmap[k].unpersist(blocking)
            n += 1
    return n


def release_blocks(spark: SparkSession) -> None:
    """Consumer-side sweep between independent queries: drop the
    table/DataFrame cache and unpersist every persistent RDD
    (checkpoint blocks included).

    Only call this once the previous query's result has been FULLY
    executed (collected / written) — localCheckpoint blocks cannot
    be recomputed."""
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in list(jmap.keys()):
        jmap[k].unpersist(False)


class RollingCheckpoint:
    """Eager per-round checkpointing with O(1) retained block sets.

    Usage inside an iterative operator::

        roll = RollingCheckpoint(spark)
        for _ in range(iters):
            df = roll(transform(df))   # round N materializes,
                                       # round N-1's blocks are freed
        # the LAST round's blocks stay pinned (the returned plan
        # reads them); call roll.release() only if the caller has
        # already reduced the result to driver-side state.
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._held: set[int] = set()

    def __call__(self, df: DataFrame) -> DataFrame:
        before = persistent_rdd_ids(self._spark)
        out = df.localCheckpoint(eager=True)
        fresh = persistent_rdd_ids(self._spark) - before
        unpersist_rdd_ids(self._spark, self._held - fresh)
        self._held = fresh
        return out

    def adopt(self, df: DataFrame) -> DataFrame:
        """Checkpoint WITHOUT freeing previously held blocks (for a
        frame that must outlive the rolling ones, e.g. the edge set
        every round reads). Tracked so :meth:`release` frees it."""
        before = persistent_rdd_ids(self._spark)
        out = df.localCheckpoint(eager=True)
        self._held |= persistent_rdd_ids(self._spark) - before
        return out

    def release(self) -> int:
        """Free every block this roller still holds. Only safe once
        the consuming plan has fully executed (or the result lives
        on the driver)."""
        n = unpersist_rdd_ids(self._spark, self._held)
        self._held = set()
        return n


@contextmanager
def scoped_blocks(spark: SparkSession) -> Iterator[None]:
    """Free every storage block CREATED inside the scope at exit.

    For code paths that fully consume their checkpoints before
    returning: streaming micro-batch sinks (every frame is written
    or collected inside the sink), training loops whose output is
    driver-side state (BPE merge lists, PQ codebooks). Pre-existing
    blocks (a caller's cache) are untouched."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        unpersist_rdd_ids(spark, persistent_rdd_ids(spark) - before)
