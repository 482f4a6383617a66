"""Multimodal columns: image/audio/video payloads as opaque binary
columns with typed metadata (beyond-reference, SURVEY.md §7 Phase 4).

Model: a media table is an ordinary DataFrame with a ``binary``
payload column plus a metadata struct — Spark shuffles/stores binary
like any other column, so partitioning, predicate pushdown on
metadata, and columnar storage all apply. Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages
(one Python process per partition, zero-copy Arrow transfer) — the
only sane pattern for CPU-bound media work at 100 TB: the cluster
parallelizes by partition, and batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decoder="fake"`` provides a deterministic md5-derived stand-in and
``decoder="pil"`` raises NotImplementedError unless PIL is
importable. The Spark-side plumbing — schema contract, Arrow batch
iteration, partition parallelism — is real and tested either way.

Frame sampling is pure built-in SQL (substring on binary is
byte-addressed), so it never leaves the JVM.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: columns appended by decode_media
DECODED_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
]

_FAKE_W_MOD = 1920
_FAKE_H_MOD = 1080


def with_binary_metadata(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Attach a typed metadata struct (byte size + content hashes) to
    a binary payload column — all JVM-side built-ins, no UDF. The
    md5 doubles as the exact-dedup key for media corpora."""
    c = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(c).alias("n_bytes"),
            F.md5(c).alias("md5"),
            F.sha2(c, 256).alias("sha256"),
        ),
    )


def fake_dims_from_md5(md5_hex: str) -> tuple[int, int, int]:
    """Deterministic stand-in decode: dimensions derived from the
    payload hash. SQL-reproducible:
    ``conv(substring(md5(content),1,8),16,10) % 1920 + 1`` etc."""
    w = int(md5_hex[:8], 16) % _FAKE_W_MOD + 1
    h = int(md5_hex[8:16], 16) % _FAKE_H_MOD + 1
    return w, h, 3


def decode_media(
    df: DataFrame, binary_col: str = "content", decoder: str = "fake"
) -> DataFrame:
    """Decode a binary media column into (width, height, channels)
    via Arrow-batched ``mapInPandas``.

    decoder="fake": deterministic md5-derived dimensions (the codec
    libraries are not available in this environment — this keeps the
    full Arrow/mapInPandas plumbing testable).
    decoder="pil": real image decode, requires PIL.
    """
    if decoder == "pil":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "decoder='pil' requires Pillow, which is not installed in "
                "this environment; use decoder='fake' for plumbing tests"
            ) from e
    elif decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = StructType(list(df.schema.fields) + DECODED_FIELDS)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        for pdf in batches:
            if decoder == "fake":
                dims = [
                    fake_dims_from_md5(hashlib.md5(bytes(b)).hexdigest())
                    for b in pdf[binary_col]
                ]
            else:  # pragma: no cover - PIL path, not in this container
                import io

                from PIL import Image

                def _pil(b: bytes) -> tuple[int, int, int]:
                    im = Image.open(io.BytesIO(b))
                    return im.width, im.height, len(im.getbands())

                dims = [_pil(bytes(b)) for b in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["channels"] = [d[2] for d in dims]
            yield pdf

    return df.mapInPandas(_decode, out_schema)


#: schema appended by audio_pcm_features
AUDIO_FEATURE_FIELDS = [
    StructField("n_samples", IntegerType()),
    StructField("rms", DoubleType()),
    StructField("peak", IntegerType()),
    StructField("zero_crossings", IntegerType()),
]


def audio_pcm_features(
    df: DataFrame, binary_col: str = "content"
) -> DataFrame:
    """Signal features over a raw PCM16-LE audio payload: sample
    count, RMS amplitude, absolute peak, zero-crossing count.

    Unlike image/video decode (codec libraries absent → stubbed),
    raw PCM needs no codec: the binary column is reinterpreted as
    int16 with numpy inside an Arrow-batched ``mapInPandas`` — the
    pattern for REAL audio featurization at scale (swap the numpy
    body for librosa/torchaudio per batch; the Spark plumbing —
    schema contract, batch iteration, per-partition parallelism —
    is identical). Vectorized per batch, no per-row Python.

    An odd trailing byte (truncated sample) is dropped, matching
    codec behavior on short reads.
    """
    out_schema = StructType(list(df.schema.fields) + AUDIO_FEATURE_FIELDS)

    def _features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            n_s, rms, peak, zc = [], [], [], []
            for b in pdf[binary_col]:
                raw = bytes(b)
                samples = np.frombuffer(
                    raw[: len(raw) - (len(raw) % 2)], dtype="<i2"
                ).astype(np.int64)
                n_s.append(len(samples))
                if len(samples):
                    rms.append(float(np.sqrt(np.mean(samples.astype("f8") ** 2))))
                    peak.append(int(np.max(np.abs(samples))))
                    signs = np.sign(samples)
                    nz = signs[signs != 0]
                    zc.append(int(np.count_nonzero(np.diff(nz) != 0)))
                else:
                    rms.append(0.0)
                    peak.append(0)
                    zc.append(0)
            pdf = pdf.copy()
            pdf["n_samples"] = n_s
            pdf["rms"] = rms
            pdf["peak"] = peak
            pdf["zero_crossings"] = zc
            yield pdf

    return df.mapInPandas(_features, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    frame_bytes: int = 1024,
    every_n: int = 1,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split a binary payload into fixed-size frames and keep every
    n-th — the frame-sampling skeleton for video/audio. Byte slicing
    is ``substring`` on binary (JVM built-in, no Python): one
    projection + explode, fully parallel, no shuffle."""
    c = binary_col
    n_frames = f"cast(ceil(length({c}) / {frame_bytes}.0) as int)"
    frames = F.expr(
        f"filter(transform(sequence(0, greatest({n_frames} - 1, 0)), "
        f"i -> struct(i AS frame_idx, "
        f"substring({c}, i * {frame_bytes} + 1, {frame_bytes}) AS frame)), "
        f"s -> s.frame_idx % {every_n} = 0)"
    )
    return df.select(
        *id_cols, F.explode(frames).alias("f")
    ).select(*id_cols, "f.frame_idx", "f.frame")
