"""ref()/source() SQL-editor autocomplete (Q5).

Reference: the SQL editor detects an UNCLOSED ``{{ ref('...`` /
``{{ source('...`` at the end of the text being typed and suggests
matching model names, source schemas, or source tables —
/root/reference/datanika/ui/state/transformation_state.py:17-19
(the three detection regexes, replicated verbatim — they are the
behavioral spec) and :608-648 (most-specific-first dispatch,
case-insensitive prefix match, 20-item cap).
"""

from __future__ import annotations

import re

from datanika_core_spark.plans.models import ModelRegistry

_REF_PATTERN = re.compile(r"""\{\{\s*ref\(\s*['"]([^'"]*?)$""")
_SOURCE_TABLE_PATTERN = re.compile(
    r"""\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]*?)$"""
)
_SOURCE_SCHEMA_PATTERN = re.compile(r"""\{\{\s*source\(\s*['"]([^'"]*?)$""")

MAX_SUGGESTIONS = 20


def suggest(registry: ModelRegistry, sql: str) -> list[str]:
    """Suggestions for the partial ``ref(``/``source(`` call the user
    is typing at the END of ``sql``. Most specific pattern wins:
    source table > source schema > ref model; no open pattern → [].
    Case-insensitive prefix match, capped at 20, registry order
    (sorted names)."""
    manifest = registry.sources_manifest()

    m = _SOURCE_TABLE_PATTERN.search(sql)
    if m:
        schema, partial = m.group(1), m.group(2).lower()
        tables = sorted(manifest.get(schema, {}))
        return [t for t in tables
                if t.lower().startswith(partial)][:MAX_SUGGESTIONS]

    m = _SOURCE_SCHEMA_PATTERN.search(sql)
    if m:
        partial = m.group(1).lower()
        return [s for s in sorted(manifest)
                if s.lower().startswith(partial)][:MAX_SUGGESTIONS]

    m = _REF_PATTERN.search(sql)
    if m:
        partial = m.group(1).lower()
        return [n for n in registry.names()
                if n.lower().startswith(partial)][:MAX_SUGGESTIONS]

    return []


def complete(sql: str, name: str) -> str:
    """Replace the open partial with ``name`` and close the call —
    transformation_state.py:683-704's `_apply_ref_suggestion`."""
    m = _SOURCE_TABLE_PATTERN.search(sql)
    if m:
        return sql[: m.start(2)] + name + "') }}" + sql[m.end():]
    m = _SOURCE_SCHEMA_PATTERN.search(sql)
    if m:
        # schema completed; leave the call open for the table partial
        return sql[: m.start(1)] + name + "', '" + sql[m.end():]
    m = _REF_PATTERN.search(sql)
    if m:
        return sql[: m.start(1)] + name + "') }}" + sql[m.end():]
    return sql
