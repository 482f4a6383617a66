"""Multimodal workloads: binary payload columns + Arrow-batched
decode, oracle-checked end to end.

The payloads are utf-8 bytes of the documents' text (the container
has no media files or codecs) — which makes the md5-derived fake
decode SQL-reproducible in DuckDB while the Spark side exercises the
REAL plumbing: binary columns, metadata structs, and a mapInPandas
Arrow decode stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.multimodal import (
    _FAKE_H_MOD,
    _FAKE_W_MOD,
    decode_media,
    sample_frames,
    with_binary_metadata,
)
from datanika_core_spark.workloads import t, workload


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a binary payload column (utf-8 text bytes)."""
    return t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.encode("text", "utf-8").alias("content")
    )


@workload(
    "multimodal_decode_meta",
    oracle=f"""
SELECT doc_id,
       strlen(text) AS n_bytes,
       md5(text) AS payload_md5,
       (('0x'||substring(md5(text),1,8))::BIGINT % {_FAKE_W_MOD} + 1)::INT
         AS width,
       (('0x'||substring(md5(text),9,8))::BIGINT % {_FAKE_H_MOD} + 1)::INT
         AS height,
       3 AS channels
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: payload bytes -> metadata struct (size,
    md5) via JVM built-ins -> decode to (width, height, channels) via
    an Arrow-batched mapInPandas stage (deterministic fake decoder;
    the real PIL decoder is the same plumbing behind
    decoder='pil')."""
    media = with_binary_metadata(_media(spark, sf_dir))
    decoded = decode_media(media, "content", decoder="fake")
    return decoded.select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.col("media_meta.md5").alias("payload_md5"),
        "width", "height", "channels",
    ).orderBy("doc_id")


@workload(
    "multimodal_frame_stats",
    oracle="""
WITH frames AS (
  SELECT doc_id,
         unnest(range(0, greatest(CAST(ceil(strlen(text) / 256.0) AS INT), 1)))
           AS frame_idx,
         strlen(text) AS n_bytes
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames_kept,
       CAST(sum(CASE WHEN frame_idx * 256 + 256 <= n_bytes THEN 256
                ELSE n_bytes - frame_idx * 256 END) AS BIGINT) AS bytes_kept
FROM frames
WHERE frame_idx % 2 = 0
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: split payloads into 256-byte frames, keep every
    2nd (video frame-sample skeleton). Pure JVM byte slicing —
    substring on binary — verified against arithmetic frame-size
    accounting in the oracle."""
    frames = sample_frames(
        _media(spark, sf_dir), "content",
        frame_bytes=256, every_n=2, id_cols=("doc_id",),
    )
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames_kept"),
            F.sum(F.length("frame")).cast("bigint").alias("bytes_kept"),
        )
        .orderBy("doc_id")
    )


@workload(
    "multimodal_audio_features",
    oracle="""
WITH s AS (
  SELECT doc_id,
         strlen(text) // 2 AS n_samples,
         list_transform(range(0, strlen(text) // 2),
           i -> ascii(substring(text, 2 * i + 1, 1))
                + 256 * ascii(substring(text, 2 * i + 2, 1))) AS samples
  FROM documents
)
SELECT doc_id,
       CAST(n_samples AS BIGINT) AS n_samples,
       round(sqrt(list_sum(list_transform(samples,
             x -> CAST(x AS DOUBLE) * x)) / n_samples), 6) AS rms,
       CAST(list_max(samples) AS BIGINT) AS peak
FROM s
WHERE n_samples > 0
ORDER BY doc_id
""",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio featurization end-to-end: the binary payload
    reinterpreted as PCM16-LE inside the Arrow-batched numpy stage
    (operators/multimodal.py::audio_pcm_features — the librosa-shaped
    plumbing), emitting per-clip sample count, RMS amplitude, and
    peak. The oracle reconstructs the same little-endian samples
    arithmetically from the (all-ASCII) payload bytes, so the decode
    path is value-checked, not just shape-checked. Zero-crossing
    count is covered by the numpy-parity unit test (it is
    identically 0 on ASCII payloads — both bytes positive)."""
    from datanika_core_spark.operators.multimodal import audio_pcm_features

    feats = audio_pcm_features(_media(spark, sf_dir))
    return (
        feats.filter(F.col("n_samples") > 0)
        .select(
            "doc_id",
            F.col("n_samples").cast("bigint").alias("n_samples"),
            F.round("rms", 6).alias("rms"),
            F.col("peak").cast("bigint").alias("peak"),
        )
        .orderBy("doc_id")
    )


@workload(
    "multimodal_keyframe_select",
    oracle="""
WITH frames AS (
  SELECT doc_id,
         unnest(range(0, greatest(CAST(ceil(strlen(text) / 256.0) AS INT), 1)))
           AS frame_idx,
         text
  FROM documents
),
scored AS (
  SELECT doc_id, frame_idx,
         ('0x'||substring(md5(substr(text, frame_idx * 256 + 1, 256)),
          1, 8))::BIGINT AS energy
  FROM frames
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(min(CASE WHEN rk = 1 THEN frame_idx END) AS BIGINT)
         AS key_frame_idx,
       CAST(max(CASE WHEN rk = 1 THEN energy END) AS BIGINT)
         AS key_energy
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY energy DESC, frame_idx) AS rk
  FROM scored
)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection skeleton: score every 256-byte frame with a
    deterministic energy function (md5-derived here — the stand-in
    for visual-change magnitude, same fake-decoder convention as
    multimodal_decode_meta) and keep the argmax frame per document —
    the representative-frame pick a video curation pipeline runs
    before captioning/embedding.

    Scale: frame explode is the only volume multiplier (bounded by
    payload/256); scoring is a scan-stage expression on the frame
    bytes; the argmax is one window keyed by doc. With real codecs
    the energy function swaps to a Pandas-UDF decode — the
    partitioning, explode shape and argmax stay identical."""
    from pyspark.sql import Window

    frames = sample_frames(
        _media(spark, sf_dir), "content",
        frame_bytes=256, every_n=1, id_cols=("doc_id",),
    )
    scored = frames.withColumn(
        "energy",
        F.expr("cast(conv(substring(md5(frame), 1, 8), 16, 10) as bigint)"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("energy").desc(), F.col("frame_idx")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.min(F.when(F.col("rk") == 1, F.col("frame_idx")))
            .cast("bigint")
            .alias("key_frame_idx"),
            F.max(F.when(F.col("rk") == 1, F.col("energy")))
            .cast("bigint")
            .alias("key_energy"),
        )
        .orderBy("doc_id")
    )
