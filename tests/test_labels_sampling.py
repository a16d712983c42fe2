"""Label vocab / tagset masks (P6-P8, S5) and sampling (R1-R3, A5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nametag3_spark.functions.labels import (
    CONTROL_LABELS,
    TAGSETS,
    UNK,
    LabelVocab,
    load_model_options,
    save_model_options,
)
from nametag3_spark.operators.sampling import (
    corpus_weights,
    stratified_sample,
    subword_masking,
)


def test_vocab_control_labels_first():
    v = LabelVocab()
    assert v.id2label[:5] == CONTROL_LABELS
    assert v.label2id["<unk>"] == UNK


def test_vocab_grows_then_freezes():
    v = LabelVocab()
    a = v.add("B-PER-conll")
    assert a == 5
    v.freeze()
    assert v.add("B-NEW") == UNK  # frozen: unseen → <unk>
    assert v.get("B-PER-conll") == a
    assert v.get("nonsense") == UNK


def test_tagset_mask():
    v = LabelVocab(["B-PER-conll", "I-PER-conll", "O", "B-PER-uner", "B-X-other"])
    v.freeze()
    mask = v.tagset_mask("conll")
    assert mask[v.get("B-PER-conll")] == 0.0
    assert mask[v.get("O")] == 0.0
    assert mask[v.get("B-PER-uner")] == -1e9
    assert mask[v.get("B-X-other")] == -1e9
    assert mask.dtype == np.float32 and len(mask) == len(v.id2label)


def test_suffix_strip_roundtrip():
    for tagset in TAGSETS:
        for tag in TAGSETS[tagset]:
            suffixed = LabelVocab.suffix_for_tagset(tag, tagset)
            assert LabelVocab.strip_tagset_suffix(suffixed) == tag


def test_vocab_persistence(tmp_path):
    v = LabelVocab(["B-PER-conll", "I-PER-conll"]).freeze()
    v.save(str(tmp_path))
    save_model_options(str(tmp_path), {"batch_size": 64, "tagsets": "conll"})
    v2 = LabelVocab.load(str(tmp_path))
    assert v2.id2label == v.id2label and v2.frozen
    assert load_model_options(str(tmp_path))["batch_size"] == 64


# ------------------------------------------------------------------ sampling

@pytest.fixture(scope="module")
def corpora(spark):
    rows = [("big", i) for i in range(900)] + [("small", i) for i in range(100)]
    return spark.createDataFrame(rows, "corpus string, x int")


def test_corpus_weights_schemes(corpora):
    w = corpus_weights(corpora, scheme="proportional")
    assert w["big"] == pytest.approx(0.9)
    u = corpus_weights(corpora, scheme="uniform")
    assert u["big"] == u["small"] == pytest.approx(0.5)
    t = corpus_weights(corpora, scheme="temperature_probs", temperature=2.0)
    assert 0.5 < t["big"] < 0.9  # flattened toward uniform
    tl = corpus_weights(corpora, scheme="temperature_logits", temperature=200.0)
    assert sum(tl.values()) == pytest.approx(1.0)


def test_stratified_sample_upsamples_small(corpora):
    out = stratified_sample(corpora, target_rows=1000, scheme="uniform", seed=42)
    counts = {r["corpus"]: r["n"] for r in out.groupBy("corpus").agg(F.count(F.lit(1)).alias("n")).collect()}
    # uniform scheme: ~500 each; "small" (100 rows) must be upsampled
    assert counts["small"] > 200
    assert abs(counts["big"] - 500) < 150


def test_stratified_sample_deterministic(corpora):
    a = stratified_sample(corpora, 400, seed=42).collect()
    b = stratified_sample(corpora, 400, seed=42).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_subword_masking(spark):
    df = spark.range(1000).withColumn("v", F.col("id"))
    masked = subword_masking(df, "v", prob=0.3, mask_value=-1, seed=7)
    frac = masked.where(F.col("v") == -1).count() / 1000
    assert 0.2 < frac < 0.4


def _py_negative_triples(pos, k=2, seed=0):
    """Independent reference for the portable filtered corruption draw."""
    from nametag3_spark.operators.sampling import (
        NEG_A, NEG_B, NEG_C, NEG_D, NEG_M,
    )

    P = 2_147_483_647
    pos = sorted(set(pos))
    vocab = sorted({o for _, _, o in pos})
    out = set()
    for s, p, o in pos:
        for j in range(k):
            h = ((s % NEG_M) * NEG_A + (p % NEG_M) * NEG_B
                 + (o % NEG_M) * NEG_C + (j + seed + 1) * NEG_D) % P
            cand = vocab[h % len(vocab)]
            if cand != o and (s, p, cand) not in pos:
                out.add((s, p, cand, j))
    return out


def test_negative_triples_matches_python_reference(spark):
    from nametag3_spark.operators.sampling import negative_triples

    pos = [(i % 11, i % 3, (i * 7) % 13) for i in range(100)]
    df = spark.createDataFrame(pos, "subj_id long, pred_id long, obj_id long")
    got = {
        (r.subj_id, r.pred_id, r.obj_id, r.neg_rank)
        for r in negative_triples(df, k=2, seed=0).collect()
    }
    assert got == _py_negative_triples(pos, k=2, seed=0)
    assert got  # the scenario must actually produce negatives


def test_negative_triples_never_collide_with_positives(spark):
    from nametag3_spark.operators.sampling import negative_triples

    pos = [(i, 0, i % 5) for i in range(50)]
    df = spark.createDataFrame(pos, "subj_id long, pred_id long, obj_id long")
    neg = negative_triples(df, k=3, seed=7).collect()
    pos_set = set(pos)
    for r in neg:
        assert (r.subj_id, r.pred_id, r.obj_id) not in pos_set
        assert r.obj_id in {o for _, _, o in pos}  # drawn from observed vocab
        assert 0 <= r.neg_rank < 3


def test_negative_triples_deterministic_and_seed_sensitive(spark):
    from nametag3_spark.operators.sampling import negative_triples

    pos = [(i % 9, 1, (i * 5) % 31) for i in range(200)]
    df = spark.createDataFrame(pos, "subj_id long, pred_id long, obj_id long")
    a = sorted(map(tuple, negative_triples(df, k=2, seed=0).collect()))
    b = sorted(map(tuple, negative_triples(df.repartition(17), k=2, seed=0).collect()))
    c = sorted(map(tuple, negative_triples(df, k=2, seed=99).collect()))
    assert a == b          # partitioning-invariant
    assert a != c          # the seed actually moves the draw


def test_negative_triples_degenerate_vocab(spark):
    from nametag3_spark.operators.sampling import negative_triples

    # single observed object -> no useful corruption exists -> empty
    df = spark.createDataFrame(
        [(1, 0, 7), (2, 0, 7)], "subj_id long, pred_id long, obj_id long"
    )
    assert negative_triples(df, k=4).count() == 0
