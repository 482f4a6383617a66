"""Multimodal operators: binary metadata, Arrow decode plumbing,
frame sampling."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.multimodal import (
    decode_media,
    fake_dims_from_md5,
    sample_frames,
    with_binary_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"hello world " * 100),
        (2, b"\x00\x01\x02\x03" * 50),
        (3, b"x"),
    ]
    return spark.createDataFrame(rows, "id int, content binary")


def test_binary_metadata(spark, media):
    got = {r.id: r.media_meta for r in with_binary_metadata(media).collect()}
    assert got[1].n_bytes == 1200
    assert got[3].md5 == hashlib.md5(b"x").hexdigest()
    assert got[2].sha256 == hashlib.sha256(b"\x00\x01\x02\x03" * 50).hexdigest()


def test_decode_fake_deterministic(spark, media):
    out = decode_media(media, "content", decoder="fake")
    assert [f.name for f in out.schema.fields[-3:]] == [
        "width", "height", "channels",
    ]
    got = {r.id: (r.width, r.height, r.channels) for r in out.collect()}
    for row in media.collect():
        md5 = hashlib.md5(bytes(row.content)).hexdigest()
        assert got[row.id] == fake_dims_from_md5(md5)
    assert all(1 <= w <= 1920 and 1 <= h <= 1080 for w, h, _ in got.values())


def test_decode_pil_unavailable_raises(spark, media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_media(media, "content", decoder="pil")


def test_decode_unknown_decoder(spark, media):
    with pytest.raises(ValueError):
        decode_media(media, "content", decoder="ffmpeg")


def test_frames_reassemble_exactly(spark, media):
    frames = sample_frames(media, "content", frame_bytes=128, every_n=1,
                           id_cols=("id",))
    back = (
        frames.orderBy("id", "frame_idx")
        .groupBy("id")
        .agg(F.collect_list("frame").alias("parts"))
        .collect()
    )
    originals = {r.id: bytes(r.content) for r in media.collect()}
    for r in back:
        assert b"".join(bytes(p) for p in r.parts) == originals[r.id]


def test_frame_sampling_every_2(spark, media):
    frames = sample_frames(media, "content", frame_bytes=100, every_n=2,
                           id_cols=("id",))
    idx = sorted(
        r.frame_idx for r in frames.filter(F.col("id") == 1).collect()
    )
    assert idx == [0, 2, 4, 6, 8, 10]  # 1200 bytes -> 12 frames, every 2nd


def test_audio_pcm_features_vs_numpy(spark):
    """PCM16 features computed through the Arrow/mapInPandas path must
    equal a direct numpy computation on the same bytes."""
    import struct

    import numpy as np

    from datanika_core_spark.operators.multimodal import audio_pcm_features

    # deterministic synthetic signals incl. an odd-length payload
    sig_a = [0, 1000, -1000, 30000, -30000, 5, -5, 0]
    sig_b = [100] * 50 + [-100] * 50
    pay_a = struct.pack("<" + "h" * len(sig_a), *sig_a)
    pay_b = struct.pack("<" + "h" * len(sig_b), *sig_b) + b"\x01"  # odd byte
    df = spark.createDataFrame(
        [(1, bytearray(pay_a)), (2, bytearray(pay_b)), (3, bytearray(b""))],
        "media_id int, content binary",
    )
    got = {
        r.media_id: (r.n_samples, round(r.rms, 6), r.peak, r.zero_crossings)
        for r in audio_pcm_features(df).collect()
    }

    def expect(sig):
        arr = np.array(sig, dtype=np.int64)
        if not len(arr):
            return (0, 0.0, 0, 0)
        nz = np.sign(arr)[np.sign(arr) != 0]
        return (
            len(arr),
            round(float(np.sqrt(np.mean(arr.astype("f8") ** 2))), 6),
            int(np.max(np.abs(arr))),
            int(np.count_nonzero(np.diff(nz) != 0)),
        )

    assert got[1] == expect(sig_a)
    assert got[2] == expect(sig_b)  # trailing odd byte dropped
    assert got[3] == (0, 0.0, 0, 0)
