"""Backup / restore (O7) — versioned JSON export of connections +
uploads with sensitive values masked, import re-linking by
connection name.

Reference: /root/reference/datanika/services/backup_service.py:14-80+
(mask value = "CHANGE_ME"; export is versioned; import matches
connections by name and skips/marks entries whose connections are
missing).
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from datanika_core_spark.errors import ValidationError

BACKUP_VERSION = 1
MASK = "CHANGE_ME"

#: config keys whose values are masked on export (credential-ish)
SENSITIVE_KEYS = {
    "password", "secret", "token", "api_key", "apikey", "private_key",
    "service_account_json", "aws_secret_access_key", "credentials",
}


def _mask(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {
            k: (MASK if k.lower() in SENSITIVE_KEYS else _mask(v))
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [_mask(v) for v in obj]
    return obj


def export_backup(
    connections: list[dict[str, Any]],
    uploads: list[dict[str, Any]],
) -> str:
    """Serialize connections + uploads to a versioned JSON document
    with sensitive config values masked. Uploads reference their
    connections BY NAME (so restore works across environments where
    ids differ)."""
    doc = {
        "version": BACKUP_VERSION,
        "connections": [
            {
                "name": c["name"],
                "type": c.get("type"),
                "direction": c.get("direction"),
                "config": _mask(c.get("config", {})),
            }
            for c in connections
        ],
        "uploads": [
            {
                "name": u["name"],
                "source_connection": u.get("source_connection"),
                "destination_connection": u.get("destination_connection"),
                "dlt_config": _mask(u.get("dlt_config", {})),
                "status": u.get("status", "draft"),
            }
            for u in uploads
        ],
    }
    return json.dumps(doc, indent=2, sort_keys=True)


def import_backup(
    payload: str,
    existing_connections: list[dict[str, Any]] | None = None,
) -> dict[str, Any]:
    """Parse a backup document; re-link uploads to connections by
    name. Returns {connections, uploads, skipped} where ``skipped``
    lists uploads whose source/destination connection is absent from
    both the backup and ``existing_connections``."""
    try:
        doc = json.loads(payload)
    except json.JSONDecodeError as e:
        raise ValidationError(f"invalid backup JSON: {e}") from e
    if doc.get("version") != BACKUP_VERSION:
        raise ValidationError(
            f"unsupported backup version {doc.get('version')!r}"
        )
    known = {c["name"] for c in doc.get("connections", [])}
    known.update(c["name"] for c in (existing_connections or []))
    uploads, skipped = [], []
    for u in doc.get("uploads", []):
        missing = [
            n for n in (u.get("source_connection"),
                        u.get("destination_connection"))
            if n and n not in known
        ]
        if missing:
            skipped.append({"upload": u["name"], "missing": missing})
        else:
            uploads.append(u)
    return {
        "connections": doc.get("connections", []),
        "uploads": uploads,
        "skipped": skipped,
    }
