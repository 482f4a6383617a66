"""Persisted Misra-Gries heavy-hitters store — incremental top-k
tracking for the sketch-store family (CMSSketchStore: point
frequency; HLLSketchStore: cardinality; this: the top-k GUARANTEE).

The store is a (tok, resid) residual table of at most k rows plus an
``undershoot`` scalar — the accumulated truncation mass that bounds
how far any residual can undercount its true frequency.  ``update()``
folds one batch in with the mergeable-summaries rule (Agarwal et al.,
PODS 2012): key-wise sum of the batch's offset-optimal k-counter
summary into the stored residuals, then re-truncate to k by
subtracting the (k+1)-th largest sum.  The invariant maintained
across ANY sequence of batches:

    true_count(tok) - undershoot  <=  resid(tok)  <=  true_count(tok)

so every token with true frequency > undershoot is guaranteed
present — the guarantee the batch workload
(workloads/sketches.py::heavy_hitters_misra_gries) proves against
exact counts each run.

The merge is NOT idempotent (sums, like the CMS store), so update()
carries the same batch-id watermark: a micro-batch redelivered after
a crash between the table overwrite and the streaming-checkpoint
commit is recognized and skipped.  The watermark and the undershoot
ride as sentinel rows (tok = reserved names that cannot collide with
real whitespace-split tokens because they contain a space).

At 100 TB: the stored state is <= k + 2 rows regardless of history;
each batch costs one combiner groupBy of the batch plus a <= 2k-row
driver-side merge.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: sentinel keys — contain a space, which a whitespace-split token
#: stream can never produce.
_WM_KEY = "__batch watermark__"
_US_KEY = "__undershoot mass__"


def batch_summary(toks: DataFrame, k: int) -> list[tuple[str, int, int]]:
    """Offset-optimal k-counter MG summary of one batch's ``tok``
    column: [(tok, resid)] with <= k entries plus the truncation
    offset, computed by one combiner groupBy + a top-(k+1) driver
    collect. Returns (rows, offset)."""
    from pyspark.sql import Window as _W

    cnt = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    top = (
        cnt.withColumn(
            "rnk",
            F.row_number().over(_W.orderBy(F.col("cnt").desc(), "tok")),
        )
        .filter(F.col("rnk") <= k + 1)
        .collect()
    )
    off = next((int(r["cnt"]) for r in top if r["rnk"] == k + 1), 0)
    rows = [
        (r["tok"], int(r["cnt"]) - off)
        for r in top
        if r["rnk"] <= k and int(r["cnt"]) - off > 0
    ]
    return rows, off


@dataclass
class MGSketchStore:
    """Warehouse-persisted k-counter Misra-Gries residuals."""

    spark: SparkSession
    table: str
    k: int = 16

    def _stored(self) -> tuple[dict[str, int], int, int | None]:
        """(residuals, undershoot, watermark) from the table."""
        if not self.spark.catalog.tableExists(self.table):
            return {}, 0, None
        resid: dict[str, int] = {}
        us, wm = 0, None
        for r in self.spark.table(self.table).collect():
            if r["tok"] == _WM_KEY:
                wm = int(r["resid"])
            elif r["tok"] == _US_KEY:
                us = int(r["resid"])
            else:
                resid[r["tok"]] = int(r["resid"])
        return resid, us, wm

    def update(self, toks: DataFrame, batch_id: int | None = None) -> None:
        """Fold one batch's tokens into the store (sum + truncate).
        Replay-safe via the batch-id watermark, like the CMS store."""
        resid, us, wm = self._stored()
        if batch_id is not None and wm is not None and batch_id <= wm:
            return  # replayed batch
        rows, off = batch_summary(toks, self.k)
        us += off
        for tok, r in rows:
            resid[tok] = resid.get(tok, 0) + r
        # re-truncate the merged summary to k counters
        ordered = sorted(resid.items(), key=lambda kv: (-kv[1], kv[0]))
        off2 = ordered[self.k][1] if len(ordered) > self.k else 0
        us += off2
        kept = [
            (tok, r - off2) for tok, r in ordered[: self.k] if r - off2 > 0
        ]
        out_rows = kept + [(_US_KEY, us)]
        new_wm = max(
            (x for x in (wm, batch_id) if x is not None), default=None
        )
        if new_wm is not None:
            out_rows.append((_WM_KEY, int(new_wm)))
        out = self.spark.createDataFrame(out_rows, "tok string, resid bigint")
        out.write.format("parquet").mode("overwrite").saveAsTable(self.table)
        self.spark.catalog.refreshTable(self.table)

    def last_batch_id(self) -> int | None:
        return self._stored()[2]

    def heavy_hitters(self) -> DataFrame:
        """(tok, mg_est, max_undercount, rank) — every token whose
        true frequency exceeds max_undercount is guaranteed listed;
        mg_est never overestimates."""
        from pyspark.sql import Window as _W

        resid, us, _ = self._stored()
        rows = sorted(resid.items(), key=lambda kv: (-kv[1], kv[0]))
        out = self.spark.createDataFrame(
            [(tok, r, us) for tok, r in rows],
            "tok string, mg_est bigint, max_undercount bigint",
        )
        return out.withColumn(
            "rank",
            F.row_number().over(
                _W.orderBy(F.col("mg_est").desc(), "tok")
            ).cast("bigint"),
        )
