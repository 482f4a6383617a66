"""MongoDB as a Spark 4 Python DataSource — the executor-parallel
upgrade of the driver-side Mongo source (S8, sources/mongodb.py;
reference semantics: mongodb_source.py:10-47, dlt_runner.py:262-289:
batched find(), ObjectId -> str).

``spark.read.format("mongo_ds")`` with one input partition per
(collection, chunk): each executor task cursors through its own
chunk, so a multi-collection extract fans out across the cluster
instead of serializing on the driver.

Partitioning: chunks are ``find().skip(i*chunk).limit(chunk)`` ranges
(``chunks_per_collection``). skip() is O(skip) server-side — fine for
the extract sizes the reference handles (10k-row batches); at real
scale split on ``_id`` ranges instead (min/max sampled once, one
``{_id: {$gte, $lt}}`` filter per partition — same partition shape,
server-side index seek) or use the official mongo-spark connector.

Options (strings, per the DataSource contract):
- ``schema_ddl``  (required) — output schema
- ``collections`` (required) — comma-separated collection names
- ``transport``   — "pymongo" | "file" (read
  ``{base_dir}/{collection}/chunk-{n}.json`` until missing — the
  mock transport for tests / captured dumps)
- ``base_dir``    — for transport=file
- ``database``, ``uri`` — for transport=pymongo
- ``chunks_per_collection`` — parallelism per collection (default 4)
- ``batch_size``  — cursor batch size (default 10000, ref parity)

ObjectId values (pymongo objects or Extended-JSON ``{"$oid": ...}``
maps) are coerced to str exactly like the driver-side source.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

DEFAULT_BATCH_SIZE = 10_000


def _coerce(v: Any) -> Any:
    """ObjectId -> str, recursively; also Extended-JSON $oid maps."""
    if type(v).__name__ == "ObjectId":
        return str(v)
    if isinstance(v, dict):
        if set(v.keys()) == {"$oid"}:
            return str(v["$oid"])
        return {k: _coerce(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_coerce(x) for x in v]
    return v


class _ChunkPartition(InputPartition):
    def __init__(
        self,
        collection: str,
        chunk: int,
        skip: int | None = None,
        limit: int | None = None,
    ):
        self.collection = collection
        self.chunk = chunk
        # (skip, limit) are computed ONCE on the driver in partitions()
        # so every task works from the same snapshot of the collection
        # size; executor-side counting would let concurrent writes give
        # each task different boundaries (overlapping / missed ranges).
        self.skip = skip
        self.limit = limit


class _MongoReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self.schema_ = schema
        self.options = options

    def partitions(self):
        cols = [
            c.strip()
            for c in self.options["collections"].split(",")
            if c.strip()
        ]
        n = int(self.options.get("chunks_per_collection", "4"))
        if self.options.get("transport", "pymongo") != "pymongo":
            return [_ChunkPartition(c, i) for c in cols for i in range(n)]
        # Driver-side: one count per collection, boundaries embedded in
        # the partitions so all tasks agree on them.
        import pymongo

        client = pymongo.MongoClient(self.options.get("uri"))
        db = client[self.options["database"]]
        parts: list[_ChunkPartition] = []
        for c in cols:
            total = db[c].count_documents({})
            chunk = -(-total // n) if total else 0
            for i in range(n):
                skip = i * chunk
                limit = min(chunk, max(total - skip, 0))
                if limit:
                    parts.append(_ChunkPartition(c, i, skip, limit))
        client.close()
        return parts

    def _docs_file(self, part: _ChunkPartition):
        path = os.path.join(
            self.options["base_dir"],
            part.collection,
            f"chunk-{part.chunk}.json",
        )
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def _docs_pymongo(self, part: _ChunkPartition):
        import pymongo  # executor-side import; gated by transport

        if not part.limit:
            return []
        client = pymongo.MongoClient(self.options.get("uri"))
        db = client[self.options["database"]]
        # sort on _id: skip/limit has no stable-order guarantee without
        # a sort, even on a quiescent collection — unsorted ranges can
        # overlap or miss documents across tasks. _id is always indexed.
        return (
            db[part.collection]
            .find(
                batch_size=int(
                    self.options.get("batch_size", str(DEFAULT_BATCH_SIZE))
                ),
                sort=[("_id", pymongo.ASCENDING)],
                skip=part.skip,
                limit=part.limit,
            )
        )

    def read(self, partition: _ChunkPartition):
        transport = self.options.get("transport", "pymongo")
        if transport == "file":
            docs = self._docs_file(partition)
        elif transport == "pymongo":
            docs = self._docs_pymongo(partition)
        else:
            raise ValueError(f"unknown transport {transport!r}")
        names = [f.name for f in self.schema_.fields]
        for doc in docs:
            coerced = _coerce(doc)
            yield tuple(coerced.get(n) for n in names)


class MongoDataSource(DataSource):
    """format name: ``mongo_ds``"""

    @classmethod
    def name(cls) -> str:
        return "mongo_ds"

    def schema(self) -> str:
        return self.options["schema_ddl"]

    def reader(self, schema: StructType) -> _MongoReader:
        return _MongoReader(schema, dict(self.options))
