"""Benchmark harness: runs the headline workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datanika_core_spark.session import build_spark  # noqa: E402
from datanika_core_spark.workloads import load_all  # noqa: E402


def _execute_fully(df) -> int:
    """Force FULL plan execution. count() would let Catalyst prune
    every computed column out of projection-only plans; the noop sink
    materializes every output column without writing."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Isolated warehouse + Derby metastore: a concurrent Spark session
    # in the repo cwd holds the shared metastore_db lock, and the
    # SCD2 headline writes tables — without isolation the whole bench
    # dies on the Derby lock instead of reporting numbers.
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bench_wh_")
    spark = build_spark(
        app_name="datanika_bench",
        warehouse_dir=os.path.join(scratch, "warehouse"),
        extra_conf={
            "spark.driver.extraJavaOptions":
                f"-Dderby.system.home={scratch}",
        },
    )
    registry = load_all()
    headline = {n: wl for n, wl in registry.items() if wl.headline}

    # Untimed warmup: JVM/codegen/Arrow spin-up + one tiny query, so
    # per-query numbers measure the operators, not JVM startup.
    from datanika_core_spark.session import read_table

    for tbl in ("lineitem", "orders", "customer", "events",
                "documents", "embeddings"):
        read_table(spark, os.path.join(sf_dir, f"{tbl}.parquet")).limit(
            1
        ).count()
    # One untimed end-to-end query through the noop sink: spins up
    # whole-stage codegen, the broadcast machinery, and the Arrow
    # path so the FIRST timed query doesn't absorb one-time JVM
    # warmup (~1.5 s) that isn't the operator's cost.
    if registry:
        warm = registry.get("q6_forecast_revenue") or next(iter(registry.values()))
        _execute_fully(warm.fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, wl in sorted(headline.items()):
        t0 = time.perf_counter()
        df = wl.fn(spark, sf_dir)
        _execute_fully(df)
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
