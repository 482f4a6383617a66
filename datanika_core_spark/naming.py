"""Name validation and normalization.

Parity with /root/reference/datanika/utils/naming.py:8-22 and the
identifier guard in datanika/services/dbt_project.py:20,80-88 (used to
block path traversal / SQL injection through model names).
"""

from __future__ import annotations

import re

from datanika_core_spark.errors import ValidationError

# Display names: alphanumeric + spaces (naming.py:8-16).
_NAME_RE = re.compile(r"[a-zA-Z0-9 ]+")

# SQL identifiers for models/schemas/snapshots (dbt_project.py:20).
# Validated identifiers are interpolated UNQUOTED into DDL (CREATE
# VIEW/TABLE, ALTER TABLE ... RENAME), so the accepted set must be
# exactly the bare-identifier grammar: no hyphens (would parse as
# subtraction) and fullmatch (re.match + '$' accepts a trailing
# newline).
_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")


def validate_name(name: str) -> str:
    """Validate a human-facing object name (alphanumeric + spaces)."""
    if not name or not _NAME_RE.fullmatch(name):
        raise ValidationError(
            f"invalid name {name!r}: only letters, digits and spaces allowed"
        )
    return name


def validate_identifier(ident: str) -> str:
    """Validate a SQL identifier safe to splice unquoted into DDL."""
    if not ident or not _IDENT_RE.fullmatch(ident):
        raise ValidationError(
            f"invalid identifier {ident!r}: must match [a-zA-Z_][a-zA-Z0-9_]*"
        )
    return ident


def to_snake_case(name: str) -> str:
    """Whitespace → underscore, lowercased (naming.py:19-22).

    Upload names become destination dataset (schema) names this way
    (datanika/services/upload_service.py:32).
    """
    return re.sub(r"\s+", "_", name.strip()).lower()
