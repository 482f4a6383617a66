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

#: logical nodes that bound the cardinality flowing into a window:
#: any aggregate collapses the corpus to a readout grid; Range /
#: LocalRelation / limits are small by construction
_BOUNDING = {
    "Aggregate", "Range", "LocalRelation", "OneRowRelation",
    "GlobalLimit", "LocalLimit", "Deduplicate",
}


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _scan_reachable(node) -> bool:
    name = node.nodeName()
    if name in _BOUNDING:
        return False
    if name == "InMemoryRelation":
        # a cached frame hides its lineage from children(); treat it
        # as bounded when the cached plan aggregated (the readout-grid
        # cache pattern), as a raw scan otherwise
        try:
            return "Aggregate" not in node.cachedPlan().toString()
        except Exception:
            return True
    if "Relation" in name:  # LogicalRelation / DataSourceV2Relation
        return True
    return any(_scan_reachable(c) for c in _children(node))


def unbounded_global_windows(df) -> int:
    """Count logical Window nodes with an EMPTY partition spec that
    can see a source scan below them with NO intervening aggregate —
    a single-partition sort over corpus-sized input, the one window
    shape that cannot survive a 100x scale-up. Global windows over an
    aggregated readout grid (|types| x |days| etc.) don't count."""
    plan = df._jdf.queryExecution().optimizedPlan()
    count = 0
    stack = [plan]
    while stack:
        n = stack.pop()
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            if any(_scan_reachable(c) for c in _children(n)):
                count += 1
        stack.extend(_children(n))
    return count


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="plan_signals_all")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("# Plan signals — all workloads\n")
    print(f"Input: `{sf_dir}`. One row per registry entry; regenerate "
          "with `tools/plan_signals_all.py` after plan-affecting "
          "changes. `cart` > 0 or an unexplained `smj` on a tiny side "
          "is a bug signal.\n")
    print("| workload | bhj | smj | exch | pushed | bnl | cart | gw "
          "| note |")
    print("|---|---|---|---|---|---|---|---|---|")
    flagged = []
    gw_flagged = []
    for name, wl in sorted(load_all().items()):
        t0 = time.perf_counter()
        try:
            df = wl.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            c = {k: len(re.findall(p, text)) for k, p in SIGNALS.items()}
            gw = unbounded_global_windows(df)
            notes = []
            if c["cart"]:
                notes.append("CARTESIAN")
                flagged.append(name)
            if gw:
                notes.append("GLOBAL-WINDOW-ON-SCAN")
                gw_flagged.append(name)
            print(
                f"| {name} | {c['bhj']} | {c['smj']} | {c['exch']} |"
                f" {c['pushed']} | {c['bnl']} | {c['cart']} | {gw} |"
                f" {' '.join(notes)} |"
            )
        except Exception as e:  # driver-loop workloads execute eagerly
            print(f"| {name} | — | — | — | — | — | — | — |"
                  f" plan-only failed: {type(e).__name__} |")
        if time.perf_counter() - t0 > 60:
            print(f"<!-- {name} took >60s to plan -->")
    rc = 0
    if flagged:
        print(f"\n**CartesianProduct found in: {flagged}**")
        rc = 1
    else:
        print("\nNo CartesianProduct anywhere in the registry.")
    if gw_flagged:
        print(f"\n**Unbounded global window (no partition spec over a "
              f"raw scan) found in: {gw_flagged}**")
        rc = 1
    else:
        print("\nNo unbounded global windows: every partition-less "
              "window runs on an aggregated readout grid.")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
