"""Declarative REST API source (S6).

Reference: dlt ``rest_api_source`` built from
``client{base_url, headers, auth, paginator}`` + ``resources`` +
``resource_defaults`` (dlt_runner.py:208-238). Auth is bearer/api-key/
http-basic; paginators: json_link (next-URL in body), offset, page.

Spark mapping: extraction is inherently driver-side (an HTTP API has
no partitions to parallelize over), so we page through with
``requests`` and build a DataFrame per resource via Arrow. At scale
the bottleneck is the API, not Spark; rows land distributed the
moment they become a DataFrame. (Spark 4's Python DataSource API
could push paging into tasks for APIs that support range splits —
noted as a future optimization, not parity-required.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator, Mapping

from pyspark.sql import SparkSession

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.sources.base import TableBatch

try:  # gated: not all environments ship requests
    import requests
except ImportError:  # pragma: no cover
    requests = None

PAGINATOR_TYPES = ("none", "json_link", "offset", "page_number")


def _build_auth_headers(auth: Mapping[str, Any] | None) -> dict[str, str]:
    if not auth:
        return {}
    kind = auth.get("type")
    if kind == "bearer":
        return {"Authorization": f"Bearer {auth['token']}"}
    if kind == "api_key":
        return {auth.get("name", "X-API-Key"): auth["api_key"]}
    if kind == "http_basic":
        import base64

        raw = f"{auth['username']}:{auth['password']}".encode()
        return {"Authorization": "Basic " + base64.b64encode(raw).decode()}
    raise ValidationError(f"unsupported auth type {kind!r}")


@dataclass
class RestResource:
    name: str
    path: str
    params: dict[str, Any] = field(default_factory=dict)
    data_selector: str | None = None  # key holding the record list
    primary_key: str | list[str] | None = None


@dataclass
class RestApiSource:
    """Paginate each resource and yield it as a DataFrame."""

    spark: SparkSession
    base_url: str
    resources: list[RestResource]
    headers: dict[str, str] = field(default_factory=dict)
    auth: Mapping[str, Any] | None = None
    paginator: Mapping[str, Any] | None = None
    max_pages: int = 10_000
    session_factory: Any = None  # injectable for tests

    def _http(self):
        if self.session_factory is not None:
            return self.session_factory()
        if requests is None:  # pragma: no cover
            raise ValidationError("requests not available for REST source")
        return requests.Session()

    def _records(self, payload: Any, selector: str | None) -> list[dict]:
        data = payload
        if selector:
            for key in selector.split("."):
                data = data[key]
        if isinstance(data, dict):
            data = [data]
        if not isinstance(data, list):
            raise ValidationError("REST payload is not a record list")
        return data

    def _paginate(self, http, url: str, params: dict) -> Iterator[Any]:
        pag = dict(self.paginator or {"type": "none"})
        kind = pag.get("type", "none")
        if kind not in PAGINATOR_TYPES:
            raise ValidationError(f"unsupported paginator {kind!r}")
        headers = {**self.headers, **_build_auth_headers(self.auth)}
        pages = 0
        if kind in ("none", "json_link"):
            next_url, next_params = url, params
            while next_url and pages < self.max_pages:
                resp = http.get(next_url, params=next_params, headers=headers)
                resp.raise_for_status()
                body = resp.json()
                yield body
                pages += 1
                if kind == "none":
                    return
                cursor = body
                for key in pag.get("next_url_path", "next").split("."):
                    cursor = cursor.get(key) if isinstance(cursor, dict) else None
                next_url, next_params = cursor, None
        elif kind == "offset":
            limit = int(pag.get("limit", 1000))
            offset = int(pag.get("initial_offset", 0))
            while pages < self.max_pages:
                p = {**params, pag.get("offset_param", "offset"): offset,
                     pag.get("limit_param", "limit"): limit}
                resp = http.get(url, params=p, headers=headers)
                resp.raise_for_status()
                body = resp.json()
                yield body
                pages += 1
                n = len(self._records(body, pag.get("data_selector")))
                if n < limit:
                    return
                offset += limit
        else:  # page_number
            page = int(pag.get("initial_page", 1))
            while pages < self.max_pages:
                p = {**params, pag.get("page_param", "page"): page}
                resp = http.get(url, params=p, headers=headers)
                resp.raise_for_status()
                body = resp.json()
                yield body
                pages += 1
                if not self._records(body, pag.get("data_selector")):
                    return
                page += 1

    def tables(self) -> Iterator[TableBatch]:
        http = self._http()
        for res in self.resources:
            url = self.base_url.rstrip("/") + "/" + res.path.lstrip("/")
            records: list[dict] = []
            for body in self._paginate(http, url, res.params):
                records.extend(self._records(body, res.data_selector))
            if not records:
                continue
            df = self.spark.createDataFrame(records)
            yield TableBatch(res.name, df, res.primary_key)
