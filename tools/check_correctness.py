"""Local simulation of the driver's correctness gate.

For every workload with an oracle: run the Spark query and the DuckDB
oracle at the given sf dir, compare row count, column names, and an
order-insensitive value comparison. Prints one line per query and a
summary; exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [--vanilla] [sf_dir] [name_filter...]
(--vanilla uses a config-free SparkSession, exactly like the external driver)
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datanika_core_spark.session import TESTDATA_TABLES, build_spark
from datanika_core_spark.workloads import load_all


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]
    if vanilla:
        # driver-faithful: NO engine configs — catches workloads that
        # only pass because build_spark set something (the external
        # driver builds its own plain session)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[16]").getOrCreate()
    else:
        spark = build_spark(app_name="correctness_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    registry = load_all()
    failures = []
    checked = 0
    from datanika_core_spark.blocks import release_blocks

    for name, wl in sorted(registry.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        sdf = wl.fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        # bench.py discipline: sweep cached/checkpointed blocks after
        # each fully-collected query so a 285-query session can't
        # accumulate storage toward a heap OOM under memory pressure
        release_blocks(spark)
        if not wl.oracle:
            print(f"  ~ {name}: rows-only ({len(srows)} rows)")
            checked += 1
            continue
        ores = con.sql(wl.oracle)
        ocols = list(ores.columns)
        orows = [tuple(r) for r in ores.fetchall()]
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            a, b = _norm_rows(scols, srows), _norm_rows(ocols, orows)
            if a != b:
                diff = next(
                    (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
                )
                problems.append(f"values differ, first at sorted idx {diff[0]}: "
                                f"spark={diff[1]} oracle={diff[2]}")
        checked += 1
        if problems:
            failures.append(name)
            print(f"  ✗ {name}: {'; '.join(problems)}")
        else:
            print(f"  ✓ {name} ({len(srows)} rows)")

    print(f"\n{checked} checked, {len(failures)} failed"
          + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
