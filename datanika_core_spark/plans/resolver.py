"""ref()/source()/this resolution + is_incremental() blocks (T6).

The reference shells out to ``dbt compile`` to turn Jinja into raw
SQL (dbt_project.py:437-488). Model SQL in the wild uses a small,
well-defined template surface:

- ``{{ ref('model') }}``          → target table of another model
- ``{{ source('src', 'tbl') }}``  → physical table from the source map
- ``{{ this }}``                  → the current model's own target
- ``{% if is_incremental() %} ... {% endif %}`` — incremental filter
  block, active only on incremental (non-full-refresh) runs against
  an existing target

We resolve that surface directly with a regex pass — no Jinja engine
needed, no dbt project on disk. Ephemeral models (T4) splice in as
CTEs exactly like dbt compiles them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.plans.models import Model, ModelRegistry

_REF_RE = re.compile(r"\{\{\s*ref\(\s*['\"]([\w-]+)['\"]\s*\)\s*\}\}")
_SOURCE_RE = re.compile(
    r"\{\{\s*source\(\s*['\"]([\w-]+)['\"]\s*,\s*['\"]([\w-]+)['\"]\s*\)\s*\}\}"
)
_THIS_RE = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_RE = re.compile(
    r"\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)"
    r"(?:\{%\s*else\s*%\}(.*?))?\{%\s*endif\s*%\}",
    re.DOTALL,
)


def find_refs(sql: str) -> list[str]:
    """Model names referenced via ref() (the DAG edge source)."""
    return _REF_RE.findall(sql)


def find_sources(sql: str) -> list[tuple[str, str]]:
    return _SOURCE_RE.findall(sql)


@dataclass
class CompiledModel:
    model: Model
    sql: str
    depends_on: list[str] = field(default_factory=list)


def compile_model(
    registry: ModelRegistry,
    model: Model,
    is_incremental_run: bool = False,
    _stack: tuple[str, ...] = (),
) -> CompiledModel:
    """Resolve the template surface of one model to executable
    Spark SQL. Ephemeral refs inline as CTEs (recursively)."""
    if model.name in _stack:
        raise ValidationError(
            f"circular ref involving {model.name!r}: {' -> '.join(_stack)}"
        )
    sql = model.sql_body

    # is_incremental() blocks first (they may contain {{ this }}).
    def _incr(m: re.Match) -> str:
        active, inactive = m.group(1), m.group(2) or ""
        return active if is_incremental_run else inactive

    sql = _INCR_RE.sub(_incr, sql)
    sql = _THIS_RE.sub(model.target, sql)
    sql = _SOURCE_RE.sub(
        lambda m: registry.resolve_source(m.group(1), m.group(2)), sql
    )

    depends_on: list[str] = []
    ctes: list[tuple[str, str]] = []

    def _ref(m: re.Match) -> str:
        name = m.group(1)
        depends_on.append(name)
        dep = registry.get(name)
        if dep.materialization == "ephemeral":
            inner = compile_model(
                registry, dep, is_incremental_run, _stack + (model.name,)
            )
            cte_name = f"__cte_{name}"
            if cte_name not in [c[0] for c in ctes]:
                ctes.append((cte_name, inner.sql))
            return cte_name
        return dep.target

    sql = _REF_RE.sub(_ref, sql)

    if ctes:
        cte_sql = ", ".join(f"{n} AS ({body})" for n, body in ctes)
        stripped = sql.lstrip()
        if re.match(r"(?is)^WITH\b", stripped):
            # merge with the model's own WITH clause
            sql = re.sub(r"(?is)^\s*WITH\b", f"WITH {cte_sql},", sql, count=1)
        else:
            sql = f"WITH {cte_sql} {sql}"

    return CompiledModel(model, sql.strip(), depends_on)
