"""Registry-wide consecutive-exchange audit (r12 SHARED EXCHANGE).

Shape: an Exchange hashpartitioning(B) whose subtree, before any
other exchange, contains an Exchange hashpartitioning(A) with
B a subset of A. Re-keying the FIRST shuffle to B would satisfy
every operator between them (hash(B) satisfies ClusteredDistribution
on any superset of B), fusing the two stages onto ONE exchange —
guide §2.4 ("two operations keyed the same way can often share one
exchange"; window over an aggregation key needs no second shuffle).
Found and fixed this round in dedup_repeated_span_fraction and
boilerplate_passage_removal (3 hash exchanges -> 2 each).

The flag is a CANDIDATE, not a verdict: when the lower exchange's
input benefits heavily from map-side combine (groupBy pre-agg), the
re-keyed shuffle carries the un-combined stream — measure both ways
(tools/ab_probe.py) before shipping. Operators between the two
exchanges are printed so join-bearing chains can be triaged out.

Usage: python tools/subset_exchange_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datanika_core_spark.session import build_spark  # noqa: E402
from datanika_core_spark.workloads import load_all  # noqa: E402


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


_KEY_RE = re.compile(r"hashpartitioning\((.*)\)")
_ATTR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def _hash_keys(node) -> frozenset[str] | None:
    """Attribute names of a hashpartitioning Exchange, else None.
    Read from outputPartitioning() — simpleStringWithNodeId() prints
    just "Exchange (unknown)" for ShuffleExchangeExec. Names only
    (expression ids stripped) — good enough for an audit;
    renamed-but-identical attributes would need semantic equality."""
    if "Exchange" not in node.nodeName():
        return None
    try:
        part = node.outputPartitioning().toString()
    except Exception:
        return None
    m = _KEY_RE.search(part)
    if not m:
        return None
    return frozenset(_ATTR_RE.findall(m.group(1)))


def _first_exchange_below(node):
    """(exchange, ops_between) for the nearest Exchange under `node`,
    scanning each child chain and stopping at the first exchange per
    branch. Returns every such exchange with the node names between."""
    out = []
    stack = [(c, []) for c in _children(node)]
    while stack:
        n, between = stack.pop()
        if "Exchange" in n.nodeName():
            out.append((n, between))
            continue
        stack.extend(
            (c, between + [n.nodeName()]) for c in _children(n)
        )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(app_name="subset_exchange_audit")
    # AQE off: AdaptiveSparkPlanExec is a LEAF (children() empty) and
    # would hide its subtree from this walk.
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
            upper = _hash_keys(n)
            if upper:
                for lower, between in _first_exchange_below(n):
                    lk = _hash_keys(lower)
                    if lk and upper <= lk and upper != lk:
                        flagged.append(
                            (name, sorted(upper), sorted(lk), between)
                        )
            stack.extend(_children(n))
    print(f"\n{n_done} plans audited; {len(flagged)} upper-exchange keys "
          "that are a strict subset of the exchange below "
          "(re-key the lower shuffle to fuse the stages):")
    for name, up, lo, between in flagged:
        ops = ",".join(between) or "<direct>"
        print(f"- {name}: {lo} -> {up}   via [{ops}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
