"""Multimodal plumbing: schemas, determinism, metadata pruning, frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nametag3_spark.operators.multimodal import (
    decode_and_featurize,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30).cache()


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 30
    assert dict(media.dtypes)["content"] == "binary"
    again = synth_media(spark, n=30, partitions=3)
    a = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in again.collect()}
    assert a == b  # deterministic regardless of partitioning


def test_featurize_unit_norm(spark, media):
    feats = decode_and_featurize(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        v = r["embedding"]
        assert len(v) == 32
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3


def test_featurize_composes_with_ann(spark, media):
    from nametag3_spark.operators.similarity import cosine_topk_bruteforce

    feats = decode_and_featurize(media).withColumnRenamed("media_id", "vec_id")
    q = feats.where(F.col("vec_id") < 3)
    topk = cosine_topk_bruteforce(feats, q, k=2)
    assert topk.count() == 6


def test_resize_only_touches_oversized(spark, media):
    out = resize_images(media, max_side=512)
    images = media.where(F.col("kind") == "image")
    assert out.count() == images.count()
    assert out.where(
        (F.col("meta.width") > 512) | (F.col("meta.height") > 512)
    ).count() == 0
    # small images pass through byte-identical
    small_in = {
        r["media_id"]: bytes(r["content"])
        for r in images.where(
            (F.col("meta.width") <= 512) & (F.col("meta.height") <= 512)
        ).collect()
    }
    small_out = {
        r["media_id"]: bytes(r["content"])
        for r in out.where(F.col("media_id").isin(list(small_in))).collect()
    }
    assert small_in == small_out


def test_sample_frames_counts(spark, media):
    frames = sample_frames(media, every_ms=1000, max_frames=16)
    videos = media.where(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("d")
    )
    expected = {
        r["media_id"]: min(max(r["d"] // 1000, 1), 16) for r in videos.collect()
    }
    got = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected
    row = frames.orderBy("media_id", "frame_idx").first()
    assert row["ts_ms"] == row["frame_idx"] * 1000


def test_real_decode_is_gated(spark, media):
    with pytest.raises(NotImplementedError):
        decode_and_featurize(media, fake=False)
