"""NumPy flat-softmax inference path: checkpoint source (S5), dynamic
padding (T6), logits→word realignment (J1), worker model singleton (J5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nametag3_spark.data.synth import synth_transcripts
from nametag3_spark.operators.encode import BATCH_PAD, pad_batch
from nametag3_spark.operators.infer import annotate_turns
from nametag3_spark.operators.encode import pack_conversations
from nametag3_spark.operators.np_model import (
    NpFlatNER,
    score_windows_np,
)


def test_checkpoint_roundtrip(tmp_path):
    model = NpFlatNER.init_random(seed=7)
    path = str(tmp_path / "ckpt.npz")
    model.save(path)
    loaded = NpFlatNER.load(path)
    ids = pad_batch([[11, 12, 13], [14], [15, 16, 17, 18, 19]])
    a = model.forward(ids)
    b = loaded.forward(ids)
    assert a.shape == (3, 5, len(model.labels))
    np.testing.assert_array_equal(a, b)
    assert loaded.labels == model.labels


def test_forward_masks_padding():
    model = NpFlatNER.init_random()
    ids = pad_batch([[11, 12], [13]])
    logits = model.forward(ids)
    assert ids[1, 1] == BATCH_PAD
    assert np.all(logits[1, 1] == 0.0)  # pad position masked
    assert np.any(logits[1, 0] != 0.0)


def test_score_windows_np_covers_every_token(spark, tmp_path):
    model = NpFlatNER.init_random(seed=42)
    path = str(tmp_path / "m.npz")
    model.save(path)

    t = synth_transcripts(spark, n_convs=10, avg_turns=6)
    labeled = annotate_turns(t)
    windows = pack_conversations(labeled, max_len=128)
    scored = score_windows_np(windows, path)

    n_tokens = labeled.select(F.sum(F.size("tokens"))).collect()[0][0]
    assert scored.count() == n_tokens
    dups = (
        scored.groupBy("conv_id", "turn_idx", "token_idx")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dups == 0
    # labels come from the model vocab
    assert {r["label"] for r in scored.select("label").distinct().collect()} <= set(
        model.labels
    )


def test_score_windows_np_partitioning_invariant(spark, tmp_path):
    """Same checkpoint + same input ⇒ identical keyed labels regardless of
    how windows are partitioned (the cluster-layout invariance a
    checkpointed scorer must have)."""
    model = NpFlatNER.init_random(seed=1)
    path = str(tmp_path / "m.npz")
    model.save(path)

    t = synth_transcripts(spark, n_convs=6, avg_turns=5)
    windows = pack_conversations(annotate_turns(t), max_len=96)
    a = {tuple(r) for r in score_windows_np(windows.repartition(1), path).collect()}
    b = {tuple(r) for r in score_windows_np(windows.repartition(16), path).collect()}
    assert a == b and len(a) > 0


def test_missing_checkpoint_raises(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=2, avg_turns=3)
    windows = pack_conversations(annotate_turns(t))
    with pytest.raises(Exception):
        score_windows_np(windows, str(tmp_path / "nope.npz")).collect()
