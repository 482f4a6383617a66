"""Model dependency DAG + dbt selector grammar (T7).

The reference builds ``--select`` strings with graph operators
(``+name`` upstream, ``name+`` downstream — pipeline_service.py:114-129)
and lets dbt topo-order execution. Here the DAG is explicit: edges
come from resolved ref() calls, selection is closure traversal,
execution order is a deterministic topological sort.

Note the reference's *cross-job* "topological execution" claim is
actually retry-based eventual ordering (SURVEY.md O4); within a
model run, dbt does topo-sort — and so do we.
"""

from __future__ import annotations

from graphlib import TopologicalSorter

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.plans.models import ModelRegistry
from datanika_core_spark.plans.resolver import find_refs


def build_graph(registry: ModelRegistry) -> dict[str, set[str]]:
    """name → set of upstream model names (ref() targets)."""
    graph: dict[str, set[str]] = {}
    for model in registry.models():
        deps = set(find_refs(model.sql_body))
        unknown = {d for d in deps if d not in registry}
        if unknown:
            raise ValidationError(
                f"model {model.name!r} refs unknown models: {sorted(unknown)}"
            )
        graph[model.name] = deps
    return graph


def topo_order(graph: dict[str, set[str]], subset: set[str] | None = None) -> list[str]:
    """Deterministic topological order (ties broken alphabetically)."""
    nodes = subset if subset is not None else set(graph)
    ts = TopologicalSorter()
    for n in sorted(nodes):
        ts.add(n, *sorted(d for d in graph.get(n, ()) if d in nodes))
    try:
        return list(ts.static_order())
    except Exception as exc:  # CycleError
        raise ValidationError(f"model graph has a cycle: {exc}") from exc


def topo_levels(
    graph: dict[str, set[str]], subset: set[str] | None = None
) -> list[list[str]]:
    """Topological LEVELS: each level is the sorted list of nodes
    whose in-subset dependencies are all satisfied by earlier levels.
    Models within a level are independent of each other, so a runner
    may execute them concurrently (dbt ``threads: 4`` parity —
    reference dbt_project.py:231 generates that profile setting).
    Concatenating the levels yields a valid topological order."""
    nodes = subset if subset is not None else set(graph)
    ts = TopologicalSorter()
    for n in sorted(nodes):
        ts.add(n, *sorted(d for d in graph.get(n, ()) if d in nodes))
    try:
        ts.prepare()
    except Exception as exc:  # CycleError
        raise ValidationError(f"model graph has a cycle: {exc}") from exc
    levels: list[list[str]] = []
    while ts.is_active():
        ready = sorted(ts.get_ready())
        levels.append(ready)
        ts.done(*ready)
    return levels


def _ancestors(graph: dict[str, set[str]], name: str) -> set[str]:
    out: set[str] = set()
    stack = list(graph.get(name, ()))
    while stack:
        cur = stack.pop()
        if cur not in out:
            out.add(cur)
            stack.extend(graph.get(cur, ()))
    return out


def _descendants(graph: dict[str, set[str]], name: str) -> set[str]:
    children: dict[str, set[str]] = {}
    for node, deps in graph.items():
        for d in deps:
            children.setdefault(d, set()).add(node)
    out: set[str] = set()
    stack = list(children.get(name, ()))
    while stack:
        cur = stack.pop()
        if cur not in out:
            out.add(cur)
            stack.extend(children.get(cur, ()))
    return out


def select(graph: dict[str, set[str]], selector: str | None) -> list[str]:
    """Resolve a dbt-style selector to a topo-ordered model list.

    Grammar (pipeline_service.py:114-129 surface): terms separated by
    spaces or commas; each term is ``name``, ``+name`` (include
    ancestors), ``name+`` (include descendants), ``+name+`` (both),
    or ``tag:<t>`` is NOT in the reference — omitted. None/empty →
    all models.
    """
    if not selector or not selector.strip():
        return topo_order(graph)
    chosen: set[str] = set()
    for term in selector.replace(",", " ").split():
        up = term.startswith("+")
        down = term.endswith("+")
        name = term.strip("+")
        if name not in graph:
            raise ValidationError(f"selector names unknown model {name!r}")
        chosen.add(name)
        if up:
            chosen |= _ancestors(graph, name)
        if down:
            chosen |= _descendants(graph, name)
    return topo_order(graph, chosen)
