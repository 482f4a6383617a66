"""Filesystem source (S4) + uploaded-file staging (S5).

Reference: dlt filesystem source built from ``bucket_url`` +
``file_glob`` with per-format default globs
(/root/reference/datanika/services/dlt_runner.py:10-14,191-206);
uploaded files are sha-256-named tar.gz archives extracted to a temp
dir and read as a file source
(datanika/services/file_upload_service.py:43-94,
datanika/tasks/upload_tasks.py:131-148,164-166).

Spark mapping: ``spark.read.{csv,json,parquet}`` on the glob. The
reader is distributed and schema-pruning/pushdown-capable — unlike
the reference, which funnels every file through a single dlt worker
process. s3 buckets map to ``s3a://`` URLs (hadoop-aws credentials
via ``fs.s3a.*`` configs); the code path is identical so local tests
cover it.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tarfile
import tempfile
from dataclasses import dataclass, field
from typing import Iterator, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.sources.base import TableBatch

#: format → default glob (dlt_runner.py:10-14).
DEFAULT_GLOBS: Mapping[str, str] = {
    "csv": "*.csv",
    "json": "*.json",
    "jsonl": "*.jsonl",
    "parquet": "*.parquet",
    # engine extensions over the reference's format list: columnar
    # ORC and Avro ship with Spark's builtin/bundled datasources.
    "orc": "*.orc",
    "avro": "*.avro",
    "any": "*",
}

#: 20 MB cap on uploaded files (file_upload_service.py:19).
MAX_UPLOAD_BYTES = 20 * 1024 * 1024


@dataclass
class FilesystemSource:
    """Glob-read files of one format from a bucket/dir as one table."""

    spark: SparkSession
    bucket_url: str
    file_format: str = "parquet"
    file_glob: str | None = None
    table_name: str = "files"
    reader_options: dict = field(default_factory=dict)
    #: malformed-row policy for the text formats (csv/json/jsonl):
    #: - "permissive" (default, dlt-like tolerance): bad rows load
    #:   with NULL fields plus the raw line in `_corrupt_record`, so
    #:   nothing is silently lost and quarantine() can split them out;
    #: - "drop": bad rows are discarded (Spark DROPMALFORMED);
    #: - "fail": first bad row aborts the load (Spark FAILFAST).
    bad_records: str = "permissive"

    #: the quarantine column PERMISSIVE mode captures raw lines into
    CORRUPT_COL = "_corrupt_record"

    _BAD_MODES = {
        "permissive": "PERMISSIVE",
        "drop": "DROPMALFORMED",
        "fail": "FAILFAST",
    }

    def __post_init__(self):
        if self.file_format not in DEFAULT_GLOBS:
            raise ValidationError(
                f"unsupported file format {self.file_format!r};"
                f" allowed: {sorted(DEFAULT_GLOBS)}"
            )
        if self.bad_records not in self._BAD_MODES:
            raise ValidationError(
                f"bad_records must be one of {sorted(self._BAD_MODES)},"
                f" got {self.bad_records!r}"
            )

    def _text_reader(self):
        return self.spark.read.options(**self.reader_options).option(
            "mode", self._BAD_MODES[self.bad_records]
        ).option("columnNameOfCorruptRecord", self.CORRUPT_COL)

    def read(self) -> DataFrame:
        glob = self.file_glob or DEFAULT_GLOBS[self.file_format]
        path = self.bucket_url.rstrip("/") + "/" + glob
        reader = self.spark.read.options(**self.reader_options)
        fmt = self.file_format
        if fmt == "csv":
            return (
                self._text_reader()
                .option("header", "true")
                .option("inferSchema", "true")
                .csv(path)
            )
        if fmt in ("json", "jsonl"):
            return self._text_reader().json(path)
        if fmt == "parquet":
            return reader.parquet(path)
        if fmt == "orc":
            return reader.orc(path)
        if fmt == "avro":
            # bundled as an external module; raises a clear
            # AnalysisException if the avro jar isn't on the classpath
            return reader.format("avro").load(path)
        # "any": let Spark's datasource infer by extension is not a
        # thing — read as binaryFile for opaque ingestion (multimodal).
        return reader.format("binaryFile").load(path)

    def quarantine(self) -> tuple[DataFrame, DataFrame]:
        """Split a permissive read into (good, bad): good rows with
        the corrupt column dropped, bad rows as (raw_record) for the
        reject table — the load-nothing-silently ingest pattern
        (write `bad` alongside the target with an `_rejects` suffix).

        Spark requires the corrupt column to be materialized before
        it can be filtered on (a cached/persisted scan); a cheap
        localCheckpoint guarantees that regardless of caller plans."""
        if self.bad_records != "permissive":
            raise ValidationError(
                "quarantine() requires bad_records='permissive'"
            )
        df = self.read()
        if self.CORRUPT_COL not in df.columns:
            # schema inference found no malformed rows at all
            return df, df.limit(0).select(
                F.lit(None).cast("string").alias("raw_record")
            ).limit(0)
        df = df.localCheckpoint(eager=False)
        bad = (
            df.filter(F.col(self.CORRUPT_COL).isNotNull())
            .select(F.col(self.CORRUPT_COL).alias("raw_record"))
        )
        good = df.filter(F.col(self.CORRUPT_COL).isNull()).drop(
            self.CORRUPT_COL
        )
        return good, bad

    def tables(self) -> Iterator[TableBatch]:
        yield TableBatch(self.table_name, self.read())


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@dataclass
class UploadedFileStore:
    """Stores user-uploaded CSV/JSON/Parquet files as sha-256-named
    tar.gz archives and stages them back out for ingestion runs (S5)."""

    root: str

    ALLOWED_EXT = (".csv", ".json", ".jsonl", ".parquet")

    def store(self, src_path: str) -> str:
        """Archive a file; returns its sha-256 id."""
        ext = os.path.splitext(src_path)[1].lower()
        if ext not in self.ALLOWED_EXT:
            raise ValidationError(f"unsupported upload extension {ext!r}")
        if os.path.getsize(src_path) > MAX_UPLOAD_BYTES:
            raise ValidationError("uploaded file exceeds 20 MB cap")
        digest = sha256_file(src_path)
        os.makedirs(self.root, exist_ok=True)
        archive = os.path.join(self.root, f"{digest}.tar.gz")
        if not os.path.exists(archive):
            with tarfile.open(archive, "w:gz") as tar:
                tar.add(src_path, arcname=os.path.basename(src_path))
        return digest

    def extract_for_run(self, digest: str) -> str:
        """Extract the archive into a temp dir; caller must clean up
        (mirrors extract_for_dlt + finally-rmtree,
        upload_tasks.py:131-148,164-166)."""
        archive = os.path.join(self.root, f"{digest}.tar.gz")
        if not os.path.exists(archive):
            raise ValidationError(f"no uploaded file with id {digest}")
        tmpdir = tempfile.mkdtemp(prefix=f"upload_{digest[:12]}_")
        with tarfile.open(archive, "r:gz") as tar:
            tar.extractall(tmpdir, filter="data")
        return tmpdir

    def cleanup(self, tmpdir: str) -> None:
        shutil.rmtree(tmpdir, ignore_errors=True)
