"""MongoDB source (S8).

Reference: one resource per collection, batched ``find()`` with
``batch_size`` (default 10 000), ObjectId coerced to str
(mongodb_source.py:10-47, dlt_runner.py:262-289).

Spark mapping: with the official mongo-spark connector on the
classpath this is ``spark.read.format("mongodb")`` (distributed,
pushdown-capable) — preferred at scale. This container has no
connector jar, so the fallback is driver-side pymongo batching →
``createDataFrame``, matching the reference's own row-loop design.
The client is injectable so semantics are testable without a server.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql import SparkSession

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.sources.base import TableBatch

DEFAULT_BATCH_SIZE = 10_000


def _coerce_ids(doc: dict) -> dict:
    """ObjectId → str, recursively (parity: mongodb_source.py:10-12)."""
    out = {}
    for k, v in doc.items():
        if type(v).__name__ == "ObjectId":
            out[k] = str(v)
        elif isinstance(v, dict):
            out[k] = _coerce_ids(v)
        elif isinstance(v, list):
            out[k] = [
                _coerce_ids(x) if isinstance(x, dict)
                else (str(x) if type(x).__name__ == "ObjectId" else x)
                for x in v
            ]
        else:
            out[k] = v
    return out


@dataclass
class MongoDbSource:
    spark: SparkSession
    database: str
    collection_names: list[str] | None = None
    batch_size: int = DEFAULT_BATCH_SIZE
    client: Any = None  # injectable; real runs pass a pymongo.MongoClient

    def _client(self):
        if self.client is not None:
            return self.client
        try:  # pragma: no cover - pymongo absent in this container
            import pymongo

            return pymongo.MongoClient()
        except ImportError:
            raise ValidationError(
                "MongoDB source requires an injected client or pymongo"
            )

    def tables(self) -> Iterator[TableBatch]:
        client = self._client()
        db = client[self.database]
        names = self.collection_names or sorted(db.list_collection_names())
        for name in names:
            docs = [
                _coerce_ids(d)
                for d in db[name].find(batch_size=self.batch_size)
            ]
            if not docs:
                continue
            df = self.spark.createDataFrame(docs)
            yield TableBatch(name, df)
