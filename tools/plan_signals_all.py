"""Compact plan-quality table for EVERY registered workload (the
headline audit in tools/explain_audit.py dumps full plans; this one
emits one signals row per workload so scans for accidental
CartesianProduct / SortMergeJoin-of-tiny-sides cover the whole
registry, not just the bench set).

Usage: python tools/plan_signals_all.py [sf_dir] > docs/PLANS_ALL.md
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datanika_core_spark.session import build_spark  # noqa: E402
from datanika_core_spark.workloads import load_all  # noqa: E402

SIGNALS = {
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "exch": r"\bExchange\b",
    "pushed": r"PushedFilters: \[[^\]]",
    "bnl": r"BroadcastNestedLoopJoin",
    "cart": r"CartesianProduct",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="plan_signals_all")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("# Plan signals — all workloads\n")
    print(f"Input: `{sf_dir}`. One row per registry entry; regenerate "
          "with `tools/plan_signals_all.py` after plan-affecting "
          "changes. `cart` > 0 or an unexplained `smj` on a tiny side "
          "is a bug signal.\n")
    print("| workload | bhj | smj | exch | pushed | bnl | cart | note |")
    print("|---|---|---|---|---|---|---|---|")
    flagged = []
    for name, wl in sorted(load_all().items()):
        t0 = time.perf_counter()
        try:
            df = wl.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            c = {k: len(re.findall(p, text)) for k, p in SIGNALS.items()}
            note = ""
            if c["cart"]:
                note = "CARTESIAN"
                flagged.append(name)
            print(
                f"| {name} | {c['bhj']} | {c['smj']} | {c['exch']} |"
                f" {c['pushed']} | {c['bnl']} | {c['cart']} | {note} |"
            )
        except Exception as e:  # driver-loop workloads execute eagerly
            print(f"| {name} | — | — | — | — | — | — |"
                  f" plan-only failed: {type(e).__name__} |")
        if time.perf_counter() - t0 > 60:
            print(f"<!-- {name} took >60s to plan -->")
    if flagged:
        print(f"\n**CartesianProduct found in: {flagged}**")
        return 1
    print("\nNo CartesianProduct anywhere in the registry.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
