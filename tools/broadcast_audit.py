"""Registry-wide BroadcastExchange-INPUT audit (r12, guide §3.1).

The r11 prefix-index fix showed Catalyst's size estimates can pick an
EXPLODED row stream as a broadcast build side (estimates are computed
before Generate fan-out is known, so a Generate subtree looks small).
This audit walks the physical plan of every registry entry and flags
each BroadcastExchange whose build subtree contains a Generate with
no intervening aggregate/limit — i.e. the broadcast ships the raw
explode fan-out, which grows with the corpus and will eventually blow
the 8 GB broadcast cap even when the grouped/deduplicated form stays
small.

A Generate below an Aggregate/Deduplicate/Limit is NOT flagged: the
aggregate re-bounds cardinality (e.g. a distinct-token df table built
from an explode is one row per distinct value, the safe shape).

Usage: python tools/broadcast_audit.py [sf_dir] > docs/BROADCAST_AUDIT.md
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datanika_core_spark.session import build_spark  # noqa: E402
from datanika_core_spark.workloads import load_all  # noqa: E402

#: physical nodes that re-bound cardinality below a broadcast build
_BOUNDING_SUBSTRINGS = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "GlobalLimit", "LocalLimit", "TakeOrderedAndProject",
)


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _generate_reachable(node) -> bool:
    """True if a Generate (explode) feeds this subtree with no
    aggregate/limit between it and the root."""
    name = node.nodeName()
    if any(b in name for b in _BOUNDING_SUBSTRINGS):
        return False
    if name.startswith("Generate"):
        return True
    if name == "InMemoryTableScan":
        # cached frame hides lineage; inspect the cached plan text
        try:
            cached = node.relation().cachedPlan().toString()
        except Exception:
            return False
        # crude but conservative: flag only if a Generate appears
        # with no aggregate anywhere above it in the cached fragment
        return "Generate" in cached and not any(
            b in cached for b in _BOUNDING_SUBSTRINGS
        )
    return any(_generate_reachable(c) for c in _children(node))


def audit_df(df) -> list[str]:
    """Return one summary line per flagged BroadcastExchange."""
    flagged = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        n = stack.pop()
        if n.nodeName().startswith("BroadcastExchange"):
            if _generate_reachable(n):
                head = n.toString().splitlines()
                sub = next(
                    (line.strip() for line in head[1:6] if line.strip()), ""
                )
                flagged.append(f"BroadcastExchange over Generate: {sub[:120]}")
        stack.extend(_children(n))
    return flagged


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="broadcast_audit")
    # audit the static plan; AQE can only re-pick strategies from
    # runtime sizes, which is the safe direction. AQE must also be
    # OFF for the walk itself: AdaptiveSparkPlanExec is a LEAF node
    # (children() is empty), so an AQE-wrapped plan hides its whole
    # subtree from the traversal.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("# BroadcastExchange input audit — all workloads\n")
    print(f"Input: `{sf_dir}`. Flags broadcasts whose build subtree "
          "contains a Generate (explode) with no re-bounding "
          "aggregate — the estimate-driven wrong-build-side class "
          "fixed in _prefix_index (r11). Regenerate with "
          "`tools/broadcast_audit.py` after join changes.\n")
    offenders: dict[str, list[str]] = {}
    n_done = 0
    for name, wl in sorted(load_all().items()):
        t0 = time.perf_counter()
        try:
            hits = audit_df(wl.fn(spark, sf_dir))
        except Exception as e:  # driver-loop workloads execute eagerly
            print(f"- {name}: plan walk failed ({type(e).__name__})")
            continue
        n_done += 1
        if hits:
            offenders[name] = hits
            for h in hits:
                print(f"- **{name}**: {h}")
        if time.perf_counter() - t0 > 60:
            print(f"<!-- {name} took >60s -->")
    print(f"\n{n_done} plans audited; "
          f"{len(offenders)} with a Generate-fed broadcast.")
    if not offenders:
        print("\nNo BroadcastExchange builds from an un-aggregated "
              "explode stream anywhere in the registry.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
