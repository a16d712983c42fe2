"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The container ships no image/audio libraries, so the DECODE step is
stubbed (deterministic fake behind ``fake=True``, ``NotImplementedError``
otherwise) — but everything Spark-side is real and tested: schemas,
Arrow batch shapes, `mapInPandas` signatures, partition sizing, and the
metadata pushdown path (filters on width/duration prune before any
decode runs — the scan never feeds oversized blobs to Python).

Schema convention:

    media(media_id, kind, content: binary, meta: struct<...typed...>)

Feature extraction emits fixed-length float arrays compatible with the
similarity operators (operators/similarity.py), so multimodal near-dup /
ANN composes with the text pipeline.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width int, height int, sample_rate int, "
    "duration_ms int, codec string>"
)

FEATURE_DIM = 32


def synth_media(
    spark: SparkSession, n: int = 64, seed: int = 42, partitions: int = 8
) -> DataFrame:
    """Deterministic fake media table: content = seeded pseudo-random
    bytes; metadata typed per kind. Stands in for an object-store-backed
    Iceberg table of blobs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.Generator(np.random.PCG64([seed, int(i)]))
                kind = ["image", "audio", "video"][int(i) % 3]
                content = rng.bytes(256 + int(rng.integers(0, 256)))
                meta = {
                    "width": int(rng.integers(16, 4096)) if kind != "audio" else None,
                    "height": int(rng.integers(16, 4096)) if kind != "audio" else None,
                    "sample_rate": 16000 if kind != "image" else None,
                    "duration_ms": int(rng.integers(100, 60000)) if kind != "image" else None,
                    "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
                }
                rows.append(
                    {"media_id": int(i), "kind": kind, "content": content, "meta": meta}
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synth_media_portable(
    spark: SparkSession, n: int = 64, partitions: int = 8
) -> DataFrame:
    """PORTABLE twin of ``synth_media``: the same schema, but content and
    metadata come from plain integer/string arithmetic on ``media_id`` —
    no numpy RNG — so a DuckDB oracle can regenerate the table (and the
    sha256-based stub features computed from it) byte-for-byte. Pure
    column expressions: generation itself never leaves the JVM."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3).cast("int") + 1,
    )
    visual = kind != "audio"  # width/height present for image+video
    timed = kind != "image"  # sample_rate/duration for audio+video
    return spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.encode(
            F.concat(F.lit("media-"), F.col("id"), F.lit("-"), kind), "UTF-8"
        ).alias("content"),
        F.struct(
            F.when(visual, (16 + (F.col("id") * 7919) % 4080).cast("int"))
            .alias("width"),
            F.when(visual, (16 + (F.col("id") * 104729) % 4080).cast("int"))
            .alias("height"),
            F.when(timed, F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(timed, (100 + (F.col("id") * 7919) % 59900).cast("int"))
            .alias("duration_ms"),
            F.element_at(
                F.array(F.lit("png"), F.lit("pcm16"), F.lit("h264")),
                (F.col("id") % 3).cast("int") + 1,
            ).alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, out_bytes: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: SHA-256-seeded bytes of
    the requested size. REAL decoders (PIL/libav) replace exactly this
    function; the surrounding batching/schema stays."""
    digest = hashlib.sha256(content).digest()
    reps = out_bytes // len(digest) + 1
    return np.frombuffer((digest * reps)[:out_bytes], dtype=np.uint8)


def decode_and_featurize(
    media: DataFrame, fake: bool = True, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """content → fixed-dim unit-norm float feature vector (mapInPandas).

    The Arrow batch carries raw bytes; decode + pooling run per batch.
    ``fake=False`` raises until real codecs are installed.

    The stub keeps every step EXACT until the final IEEE ops: component i
    pools 8 bytes of the repeated sha256 digest as an integer sum s_i;
    the unit-norm component is ``float32(s_i / sqrt(Σ s_j²))`` (the /8
    of a mean cancels under normalization) — integer sums, one correctly-
    rounded sqrt, one division, one float32 cast, all reproducible
    bit-for-bit by any engine with sha256 + IEEE doubles. That is what
    lets ``media_features`` carry a DuckDB oracle over the portable
    media table instead of a rows-only check."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode needs PIL/torchaudio/libav — not in "
            "this container; run with fake=True (deterministic stub)"
        )
    import math

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                raw = _fake_decode(bytes(content), feature_dim * 8)
                sums = raw.reshape(feature_dim, 8).sum(
                    axis=1, dtype=np.int64
                )
                s2 = int((sums * sums).sum())
                denom = math.sqrt(s2) if s2 > 0 else 1.0
                feats.append(
                    np.asarray(sums / denom, dtype=np.float32).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": feats,
                }
            )

    return media.mapInPandas(
        fn, schema="media_id long, kind string, embedding array<float>"
    )


def resize_images(
    media: DataFrame, max_side: int = 512, fake: bool = True
) -> DataFrame:
    """Resize plumbing: metadata-predicate pruning happens BEFORE Python —
    only rows whose meta says they exceed ``max_side`` reach the UDF
    (check the plan: the filter is on the struct field, pushed to scan)."""
    if not fake:
        raise NotImplementedError("real resize needs PIL — stubbed")

    needs = media.where(
        (F.col("kind") == "image")
        & ((F.col("meta.width") > max_side) | (F.col("meta.height") > max_side))
    )
    keeps = media.where(
        (F.col("kind") == "image")
        & ~((F.col("meta.width") > max_side) | (F.col("meta.height") > max_side))
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_meta, out_content = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                w, h = meta["width"], meta["height"]
                scale = max_side / max(w, h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out_content.append(bytes(_fake_decode(bytes(content), 64)))
                out_meta.append({**meta, "width": nw, "height": nh})
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "meta": out_meta,
                }
            )

    resized = needs.mapInPandas(fn, schema=MEDIA_SCHEMA)
    return keeps.unionByName(resized)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16, fake: bool = True
) -> DataFrame:
    """Video → frame rows (media_id, frame_idx, ts_ms, frame binary).
    Frame count comes from metadata; the explode is JVM-side
    (sequence+explode), only frame DECODE is Python."""
    if not fake:
        raise NotImplementedError("real frame extraction needs libav — stubbed")

    frames = (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            "content",
            F.explode(
                F.slice(
                    F.sequence(
                        F.lit(0),
                        F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
                    ),
                    1,
                    max_frames,
                )
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "frame_idx", "ts_ms"]].copy()
            out["frame"] = [
                bytes(_fake_decode(bytes(c) + int(i).to_bytes(4, "little"), 32))
                for c, i in zip(pdf["content"], pdf["frame_idx"])
            ]
            yield out

    return frames.mapInPandas(
        fn, schema="media_id long, frame_idx int, ts_ms int, frame binary"
    )
