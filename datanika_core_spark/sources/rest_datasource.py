"""REST as a Spark 4 Python DataSource — the executor-parallel
upgrade of the driver-side REST source (S6, sources/rest.py).

``spark.read.format("rest_api")`` with one input partition per
resource: each executor task pages through its own resource, so a
100-resource API extract fans out across the cluster instead of
serializing on the driver. (Per-page range splits are possible for
APIs exposing total counts — add an ``InputPartition`` per page range
in ``partitions()``.)

Options (all strings, the DataSource contract):
- ``schema_ddl``   (required) — output schema, e.g. "id bigint, name string"
- ``resources``    (required) — comma-separated resource paths
- ``base_url``     — for transport=http
- ``transport``    — "http" (urllib, stdlib) | "file" (read
  ``{base_dir}/{resource}/page-{n}.json`` until missing — the mock
  transport used by tests; also handy for replaying captured dumps)
- ``base_dir``     — for transport=file
- ``data_selector``— optional key holding the record list in a page
- ``max_pages``    — safety cap (default 1000)

Registration: ``spark.dataSource.register(RestApiDataSource)``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _ResourcePartition(InputPartition):
    def __init__(self, resource: str):
        self.resource = resource


def _iter_pages_file(base_dir: str, resource: str,
                     max_pages: int) -> Iterator[list[dict[str, Any]]]:
    for n in range(max_pages):
        path = os.path.join(base_dir, resource, f"page-{n}.json")
        if not os.path.exists(path):
            return
        with open(path) as f:
            yield json.load(f)


def _iter_pages_http(base_url: str, resource: str,
                     max_pages: int) -> Iterator[list[dict[str, Any]]]:
    # stdlib-only paging (page_number paginator); executors typically
    # have no pip extras. Stops on first empty page.
    from urllib.request import urlopen

    for n in range(max_pages):
        url = f"{base_url.rstrip('/')}/{resource}?page={n}"
        with urlopen(url, timeout=30) as resp:  # noqa: S310
            payload = json.loads(resp.read().decode())
        if not payload:
            return
        yield payload


class _RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self.schema_ = schema
        self.options = options

    def partitions(self):
        res = [r.strip() for r in self.options["resources"].split(",") if r.strip()]
        return [_ResourcePartition(r) for r in res]

    def read(self, partition: _ResourcePartition):
        opts = self.options
        transport = opts.get("transport", "http")
        max_pages = int(opts.get("max_pages", "1000"))
        selector = opts.get("data_selector")
        if transport == "file":
            pages = _iter_pages_file(opts["base_dir"], partition.resource,
                                     max_pages)
        elif transport == "http":
            pages = _iter_pages_http(opts["base_url"], partition.resource,
                                     max_pages)
        else:
            raise ValueError(f"unknown transport {transport!r}")
        names = [f.name for f in self.schema_.fields]
        for page in pages:
            records = page.get(selector, []) if selector else page
            for rec in records:
                yield tuple(rec.get(n) for n in names)


class RestApiDataSource(DataSource):
    """format name: ``rest_api``"""

    @classmethod
    def name(cls) -> str:
        return "rest_api"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def reader(self, schema: StructType) -> _RestReader:
        return _RestReader(schema, dict(self.options))
