"""Benchmark harness: runs the headline workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Survivability (the round-5 lesson — that run died rc=1 on a driver
broadcast OOM and produced no numbers at all):
- ``spark.driver.memory`` is set explicitly (default 8g via
  $SPARK_GRAFT_DRIVER_MEM); Spark's local-mode default ~1 GiB heap
  plus a 64 MB broadcast threshold leaves no headroom for a 37-query
  session.
- After each fully-executed query, every storage block is released
  (``blocks.release_blocks``): table cache AND localCheckpoint RDD
  blocks, so query N's pinned frames can never starve query N+1's
  broadcast build. Safe exactly here because the noop write has
  fully executed the plan before the sweep runs.

Repeat-median mode: $SPARK_GRAFT_BENCH_REPS=k (default 3) runs the
whole headline loop k times; "queries" reports per-query MEDIANS, and
a `# spread: {...}` STDERR line reports per-query [min, max] so noise
stays visible (single-run noise at sf0.1 was measured at ±20-90% in
rounds 4-5; the r7 driver artifact swung +47% on zero plan changes,
hence medians by default). The spread used to live on the stdout
JSON line, which grew it past the driver's tail-capture buffer and
silently broke the r11 round-over-round comparison — the parsed
stdout line now carries only medians/totals/loadavg (~1.5 KB).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _execute_fully(df) -> int:
    """Force FULL plan execution. count() would let Catalyst prune
    every computed column out of projection-only plans; the noop sink
    materializes every output column without writing."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    try:
        load0 = os.getloadavg()[0]
    except OSError:
        load0 = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    # Belt and braces: spark.driver.memory only applies at JVM
    # launch. build_spark's conf does reach spark-submit (pyspark's
    # launch_gateway forwards SparkConf entries), but an already-set
    # PYSPARK_SUBMIT_ARGS would win — so set it explicitly too.
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {driver_mem} pyspark-shell"
        )

    from datanika_core_spark.blocks import release_blocks
    from datanika_core_spark.session import build_spark, read_table
    from datanika_core_spark.workloads import load_all

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
            "spark.driver.memory": driver_mem,
            "spark.driver.extraJavaOptions":
                f"-Dderby.system.home={scratch}",
        },
    )
    heap_mb = (
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
        // (1024 * 1024)
    )
    print(f"# driver max heap: {heap_mb} MiB", file=sys.stderr)
    registry = load_all()
    headline = {n: wl for n, wl in registry.items() if wl.headline}

    # Untimed warmup: JVM/codegen/Arrow spin-up + one tiny query, so
    # per-query numbers measure the operators, not JVM startup.
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
    release_blocks(spark)

    samples: dict[str, list[float]] = {n: [] for n in headline}
    for rep in range(reps):
        for name, wl in sorted(headline.items()):
            t0 = time.perf_counter()
            df = wl.fn(spark, sf_dir)
            _execute_fully(df)
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"# rep{rep} {name}: {dt:.3f}s", file=sys.stderr)
            # plan fully executed → free its cache/checkpoint blocks
            # before the next query builds (localCheckpoint blocks
            # are non-recomputable, so this is ONLY safe post-execute)
            release_blocks(spark)

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": reps,
    }
    # Contention telemetry (the r9 lesson: the official artifact was
    # recorded under battery residual load and its inflated medians
    # read as code regressions). 1-min loadavg at start/end — a solo
    # steady-state run on this 32-cpu box shows start ≲ a few; a run
    # taken mid-battery shows tens. Readers should trust the medians
    # only when load was quiet.
    # Only emit when BOTH samples succeeded — a half-failed pair
    # (e.g. a -1 sentinel) would read as a real load value.
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    if load0 is not None and load1 is not None:
        out["loadavg_1m"] = [round(load0, 1), round(load1, 1)]
    if reps > 1:
        # Per-query [min, max] spread stays available for noise
        # analysis, but on STDERR: the r11 round-over-round comparison
        # was destroyed because the spread dict doubled the stdout
        # JSON line past the driver's tail-capture buffer (r10's line
        # failed to parse, so every prev_sec was null). The parsed
        # contract line carries only medians + totals and stays
        # bounded (~1.5 KB at 37 queries).
        spread = {
            n: [round(min(s), 3), round(max(s), 3)]
            for n, s in samples.items()
        }
        print(f"# spread: {json.dumps(spread)}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
