"""Multimodal binary-column plumbing tests (functions/multimodal.py).

The codec itself is stubbed (no PIL/soundfile in this runtime); these tests
pin everything around it: schema, geometry, batch fan-out, determinism, and
the explicit NotImplementedError contract of the real-codec hook.
"""

from __future__ import annotations

import numpy as np
import pytest

from queue_system_simulator_spark.functions.multimodal import (
    _fake_decode,
    _real_decode,
    decode_media,
    extract_features,
    frame_sample,
    resize_media,
    synthesize_media,
)


def test_real_decode_is_a_stub():
    with pytest.raises(NotImplementedError):
        _real_decode(b"\x00", "gray8")


def test_fake_decode_truncates_and_pads():
    assert _fake_decode(bytes(range(10)), 2, 3).shape == (3, 2)  # truncate
    padded = _fake_decode(b"\x05", 2, 2)  # pad
    assert padded.tolist() == [[5, 0], [0, 0]]


def test_media_synthesis_geometry(spark, sf_dir):
    media = synthesize_media(spark, sf_dir).collect()
    assert len(media) > 0
    for r in media:
        assert r.kind in ("image", "audio", "video")
        assert len(r.blob) == r.meta.width * r.meta.height  # channels=1
        assert len(r.blob) in (64, 80, 96, 112)


def test_decode_shapes(spark, sf_dir):
    rows = decode_media(synthesize_media(spark, sf_dir)).collect()
    for r in rows:
        assert len(r.pixels) == r.height * r.width


def test_features_match_blob_bytes(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    for r in media.collect():
        a = np.frombuffer(r.blob, dtype=np.uint8)
        f = feats[r.media_id]
        assert f.n_bytes == a.size
        assert f.sum_bytes == int(a.sum())
        assert f.hist_0 + f.hist_1 + f.hist_2 + f.hist_3 == a.size


def test_resize_is_deterministic_and_fixed_geometry(spark, sf_dir):
    decoded = decode_media(synthesize_media(spark, sf_dir))
    r1 = sorted(resize_media(decoded, 8, 8).collect(), key=lambda r: r.media_id)
    r2 = sorted(resize_media(decoded, 8, 8).collect(), key=lambda r: r.media_id)
    assert all(len(r.pixels) == 64 for r in r1)
    assert [r.pixels for r in r1] == [r.pixels for r in r2]


def test_frame_sample_fanout(spark, sf_dir):
    media = synthesize_media(spark, sf_dir)
    n_video = media.filter("kind = 'video'").count()
    frames = frame_sample(media, every_n=2).collect()
    assert len(frames) == 2 * n_video  # frames 0 and 2 of 4
    assert {f.frame_idx for f in frames} == {0, 2}


def test_arrow_features_match_pandas_path(spark, sf_dir):
    from queue_system_simulator_spark.functions.multimodal import (
        extract_features_arrow,
    )

    media = synthesize_media(spark, sf_dir)
    pandas_rows = sorted(map(tuple, extract_features(media).collect()))
    arrow_rows = sorted(map(tuple, extract_features_arrow(media).collect()))
    assert pandas_rows == arrow_rows


def test_perceptual_ahash_bits_are_exact(spark, sf_dir):
    """aHash bit i is pixel_i*64 > sum (integer form of above-mean) over
    the first 64 bytes; recompute one asset driver-side and compare."""
    import numpy as np

    from queue_system_simulator_spark.functions.multimodal import (
        perceptual_ahash,
        synthesize_media,
    )

    media = synthesize_media(spark, sf_dir).filter("kind = 'image'")
    row = media.orderBy("media_id").first()
    got = {
        r.media_id: r
        for r in perceptual_ahash(media).collect()
    }
    a = np.frombuffer(row.blob, dtype=np.uint8)[:64].astype(np.int64)
    bits = (a * 64 > int(a.sum())).astype(np.int64)
    h1 = int((bits[:32] << np.arange(32)).sum())
    h2 = int((bits[32:] << np.arange(32)).sum())
    assert (got[row.media_id].h1, got[row.media_id].h2) == (h1, h2)
    # halves stay in unsigned-32 range: the sign bit is never touched
    for r in got.values():
        assert 0 <= r.h1 < 1 << 32 and 0 <= r.h2 < 1 << 32


def test_shard_packing_measured_equals_declared(spark, sf_dir):
    from queue_system_simulator_spark.plans.multimodal_queries import (
        MEDIA_SHARD_BUDGET,
        q_multimodal_shard_packing,
    )

    rows = sorted(
        q_multimodal_shard_packing(spark, sf_dir).collect(),
        key=lambda r: r["shard"],
    )
    assert rows
    # measured blob bytes must reproduce the declared geometry exactly
    from queue_system_simulator_spark.schema import load_table
    from pyspark.sql import functions as F

    declared = (
        load_table(spark, sf_dir, "documents")
        .select((64 + (F.col("doc_id") % 4) * 16).alias("b"))
        .agg(F.sum("b").alias("s"))
        .collect()[0]["s"]
    )
    assert sum(r["shard_bytes"] for r in rows) == declared
    # contiguous id ranges; every closed shard crossed the budget only by
    # its final item (max item = 112 B)
    for a, b in zip(rows, rows[1:]):
        assert a["last_media"] < b["first_media"]
    for r in rows[:-1]:
        assert r["shard_bytes"] < MEDIA_SHARD_BUDGET + 112
    for r in rows:
        assert r["n_items"] == r["n_image"] + r["n_audio"] + r["n_video"]
