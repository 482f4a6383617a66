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
    # NO final orderBy (r12, guide §2.4 "an orderBy used only to make
    # output deterministic", §4 Python-boundary cost): the global
    # sort's range partitioner SAMPLES its child plan, and here the
    # child is the Arrow mapInPandas decode with no exchange below it
    # — the sampling pass re-ran the ENTIRE Python decode stage (the
    # r11 sort-first defect class, on the far more expensive §4
    # boundary). The driver/oracle comparison is order-insensitive
    # (rows are sorted before hashing), so the computed result is
    # unchanged; only the cosmetic display order is dropped — the
    # perplexity_unigram_score precedent, driver-verified green.
    return decoded.select(
        "doc_id",
        F.col("media_meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.col("media_meta.md5").alias("payload_md5"),
        "width", "height", "channels",
    )


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
    # NO final orderBy (r12): same range-sampler double evaluation as
    # multimodal_decode_meta — the sort sat directly above the Arrow
    # mapInPandas PCM stage, so the sampling pass re-ran the numpy
    # featurization for every row. Order-insensitive compare; row set
    # unchanged (perplexity precedent).
    return (
        feats.filter(F.col("n_samples") > 0)
        .select(
            "doc_id",
            F.col("n_samples").cast("bigint").alias("n_samples"),
            F.round("rms", 6).alias("rms"),
            F.col("peak").cast("bigint").alias("peak"),
        )
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


# --------------------------------------------------------------------------
# Byte-budget shard packing of binary payloads (sequential cut).
# --------------------------------------------------------------------------

_SHARD_BYTES = 2048  # shard byte budget


@workload(
    "multimodal_shard_budget",
    oracle=f"""
WITH RECURSIVE lens AS (
  SELECT doc_id, source, strlen(text) AS b,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i
  FROM documents
),
packed AS (
  SELECT source, i, b, 1 AS shard_no, b AS cur
  FROM lens WHERE i = 1
  UNION ALL
  SELECT l.source, l.i, l.b,
         CASE WHEN p.cur + l.b <= {_SHARD_BYTES}
              THEN p.shard_no ELSE p.shard_no + 1 END,
         CASE WHEN p.cur + l.b <= {_SHARD_BYTES}
              THEN p.cur + l.b ELSE l.b END
  FROM lens l JOIN packed p
    ON l.source = p.source AND l.i = p.i + 1
)
SELECT source, CAST(shard_no AS BIGINT) AS shard_no,
       CAST(count(*) AS BIGINT) AS n_blobs,
       CAST(sum(b) AS BIGINT) AS shard_bytes
FROM packed
GROUP BY source, shard_no
ORDER BY source, shard_no
""",
)
def multimodal_shard_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard packing of binary payloads: blobs stream
    through each source in doc_id order and a shard is cut whenever
    the next blob would overflow the byte budget (an oversized blob
    opens its own shard) — how training shards (webdataset tars,
    tfrecord files) are actually laid out, where shard boundaries
    depend on every previous blob, not on a static cumsum.

    Like quota_greedy_per_source this is the applyInPandas
    per-key-state shape: the recurrence (shard counter + running
    bytes) is not window-expressible, groups fold independently per
    source across executors, and the DuckDB oracle replays the
    identical recurrence as a recursive CTE.

    Scale: ONE shuffle keyed by source; per-group cost is the
    sequential fold any shard writer pays. The hash-sharded exporter
    (operators/export.py) is the order-free alternative when shard
    ASSIGNMENT stability matters more than byte balance; this one
    guarantees the byte bound."""
    import pandas as pd

    lens = _media(spark, sf_dir).select(
        "doc_id", "source", F.octet_length("content").alias("b")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard, cur = 1, 0
        shards: dict[int, list[int]] = {}
        for b in pdf["b"]:
            if cur > 0 and cur + b > _SHARD_BYTES:
                shard += 1
                cur = 0
            cur += int(b)
            agg = shards.setdefault(shard, [0, 0])
            agg[0] += 1
            agg[1] += int(b)
        return pd.DataFrame(
            {
                "source": pdf["source"].iloc[0],
                "shard_no": list(shards.keys()),
                "n_blobs": [v[0] for v in shards.values()],
                "shard_bytes": [v[1] for v in shards.values()],
            }
        )

    return (
        lens.groupBy("source")
        .applyInPandas(
            pack,
            "source string, shard_no bigint, n_blobs bigint,"
            " shard_bytes bigint",
        )
        .orderBy("source", "shard_no")
    )


# --------------------------------------------------------------------------
# Scene segmentation over the frame-energy series (shot detection).
# --------------------------------------------------------------------------

_SCENE_CUT = 2147483648  # |energy delta| above this = scene cut (2^31)


@workload(
    "multimodal_scene_segmentation",
    oracle=f"""
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
),
cuts AS (
  SELECT doc_id, frame_idx,
         CASE WHEN abs(energy - lag(energy) OVER w) > {_SCENE_CUT}
              THEN 1 ELSE 0 END AS cut
  FROM scored
  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
),
scenes AS (
  SELECT doc_id, frame_idx,
         sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS scene_id
  FROM cuts
),
per_scene AS (
  SELECT doc_id, scene_id, CAST(count(*) AS BIGINT) AS scene_len
  FROM scenes GROUP BY doc_id, scene_id
)
SELECT doc_id,
       CAST(sum(scene_len) AS BIGINT) AS n_frames,
       CAST(count(*) AS BIGINT) AS n_scenes,
       CAST(max(scene_len) AS BIGINT) AS longest_scene
FROM per_scene
GROUP BY doc_id
ORDER BY doc_id
""",
)
def multimodal_scene_segmentation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shot/scene segmentation skeleton: the per-frame energy series
    (same md5 fake-decoder as multimodal_keyframe_select) is cut
    wherever consecutive frames differ by more than the threshold,
    and consecutive runs become scenes — per clip: frame count,
    scene count, longest scene. This is the standard shot-detection
    shape a video curation pipeline runs before per-scene keyframe
    extraction; with real codecs the energy swaps to a Pandas-UDF
    frame-difference decode and the windows are UNCHANGED.

    Scale: frame explode (bounded by payload/256) then two
    per-clip ordered windows — lag for the cut flags, running sum
    for scene ids — each clip's frames are one window partition, so
    parallelism is per-clip and state per partition is one frame.
    All arithmetic is exact integers."""
    from pyspark.sql import Window

    frames = sample_frames(
        _media(spark, sf_dir), "content",
        frame_bytes=256, every_n=1, id_cols=("doc_id",),
    )
    scored = frames.withColumn(
        "energy",
        F.expr("cast(conv(substring(md5(frame), 1, 8), 16, 10) as bigint)"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    cuts = scored.select(
        "doc_id", "frame_idx",
        F.when(
            F.abs(F.col("energy") - F.lag("energy").over(w)) > _SCENE_CUT,
            1,
        ).otherwise(0).alias("cut"),
    )
    scenes = cuts.select(
        "doc_id",
        F.sum("cut")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("scene_id"),
    )
    per_scene = scenes.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("scene_len")
    )
    return (
        per_scene.groupBy("doc_id")
        .agg(
            F.sum("scene_len").cast("bigint").alias("n_frames"),
            F.count(F.lit(1)).cast("bigint").alias("n_scenes"),
            F.max("scene_len").cast("bigint").alias("longest_scene"),
        )
        .orderBy("doc_id")
    )
