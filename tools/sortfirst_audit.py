"""Registry-wide final-sort audit (r12, the r11 SORT-FIRST rule).

A final global orderBy's range partitioner SAMPLES its child plan
with a separate job. When there is NO shuffle below the sort, the
sampling pass re-executes the entire scan+compute subtree (map-only
plans: everything runs twice); when an Exchange sits below, shuffle
files are reused and only the post-shuffle stage re-runs (cheap).

Flags every registry entry whose physical plan has a global Sort
whose subtree below the range Exchange contains NO other Exchange —
the candidates for the r11 sort-first fix (hoist expensive
projections above the sort, or drop a cosmetic sort outright).

Usage: python tools/sortfirst_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datanika_core_spark.session import build_spark  # noqa: E402
from datanika_core_spark.workloads import load_all  # noqa: E402


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _count_nodes(node, substr: str) -> int:
    n = 1 if substr in node.nodeName() else 0
    return n + sum(_count_nodes(c, substr) for c in _children(node))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="sortfirst_audit")
    # AQE off: AdaptiveSparkPlanExec is a LEAF (children() empty), so
    # an AQE-wrapped plan would hide its subtree from this walk.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    flagged = []
    n_done = 0
    for name, wl in sorted(load_all().items()):
        try:
            plan = wl.fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        except Exception as e:
            print(f"- {name}: plan failed ({type(e).__name__})")
            continue
        n_done += 1
        stack = [plan]
        while stack:
            n = stack.pop()
            nm = n.nodeName()
            if nm == "Sort":
                # Scala method is `global` (a Python keyword) — call
                # via getattr; "true" in the node string ("Sort [...],
                # true, 0") is the fallback
                try:
                    is_global = bool(getattr(n, "global")())
                except Exception:
                    is_global = ", true, " in n.simpleStringWithNodeId()
                if is_global:
                    kids = _children(n)
                    # only a Sort fed by an Exchange rangepartitioning
                    # has a sampling pass; a global sort whose child
                    # is already single-partition (e.g. above a global
                    # aggregate) sorts locally with no resample
                    has_range_exch = bool(kids) and (
                        "rangepartitioning"
                        in kids[0].toString().splitlines()[0]
                    )
                    below_exch = sum(
                        _count_nodes(c, "Exchange") for c in kids
                    )
                    # the sort's own range exchange is the first
                    # Exchange below it; no OTHER exchange below that
                    # means the sampler re-runs the full subtree
                    scans = sum(
                        _count_nodes(c, "Scan parquet")
                        + _count_nodes(c, "FileSourceScan")
                        for c in kids
                    )
                    if has_range_exch and below_exch <= 1 and scans:
                        py = sum(
                            _count_nodes(c, "InPandas")
                            + _count_nodes(c, "ArrowEval")
                            + _count_nodes(c, "BatchEval")
                            for c in kids
                        )
                        flagged.append((name, py))
                        break
            stack.extend(_children(n))
    print(f"\n{n_done} plans audited; {len(flagged)} with a global Sort "
          "over a shuffle-free subtree (sampler re-runs everything):")
    for name, py in flagged:
        tag = "  [PYTHON STAGE BELOW]" if py else ""
        print(f"- {name}{tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
