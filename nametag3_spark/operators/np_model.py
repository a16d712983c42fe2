"""Real-tensor inference path without torch: a NumPy flat-softmax NER
head over packed subword windows.

The reference's production scorer is an XLM-R encoder with a flat-BIO
softmax head (nametag3_model.py:786-799); torch/transformers are absent
in this container, so that exact encoder stays behind
``HFTransformerScorer``'s import gate. What CAN be closed here — and is —
is everything AROUND the matmuls, with actual tensors flowing:

* **S5 model/checkpoint source**: weights serialize to a single ``.npz``
  checkpoint; workers load it lazily from a path (exactly how a torch
  ``state_dict`` would ship) and keep ONE instance per reused Python
  worker (J5, the reference's shared-checkpoint pattern,
  nametag3_server.py:437-444).
* **T6 dynamic padding**: windows pad to the batch max with
  BATCH_PAD=-1, masked inside ``forward``.
* **J1 realignment**: per-word labels come from the logits at each
  word's FIRST subword (word_ids), keyed back to (conv_id, turn_idx,
  token_idx) — the window path's key-join realignment, now driven by a
  real ``(batch, seq, n_labels)`` logits tensor.

Swapping ``NpFlatNER.forward`` for an XLM-R forward is the ONLY change
production needs; every Spark-side contract is exercised by this model.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from nametag3_spark.operators.encode import BATCH_PAD, pad_batch

HASH_DIM = 4096  # hashing-trick embedding rows: row = subword_id % HASH_DIM
EMB_DIM = 32
HIDDEN_DIM = 64

DEFAULT_LABELS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]


class NpFlatNER:
    """Embedding (hashing trick) → ReLU MLP → per-subword label logits."""

    def __init__(
        self,
        emb: np.ndarray,
        w1: np.ndarray,
        b1: np.ndarray,
        w2: np.ndarray,
        b2: np.ndarray,
        labels: list[str],
    ) -> None:
        self.emb, self.w1, self.b1, self.w2, self.b2 = emb, w1, b1, w2, b2
        self.labels = list(labels)

    @classmethod
    def init_random(
        cls, labels: list[str] | None = None, seed: int = 42
    ) -> "NpFlatNER":
        labels = labels or DEFAULT_LABELS
        rng = np.random.Generator(np.random.PCG64(seed))
        return cls(
            emb=rng.standard_normal((HASH_DIM, EMB_DIM)).astype(np.float32) * 0.1,
            w1=rng.standard_normal((EMB_DIM, HIDDEN_DIM)).astype(np.float32) * 0.1,
            b1=np.zeros(HIDDEN_DIM, dtype=np.float32),
            w2=rng.standard_normal((HIDDEN_DIM, len(labels))).astype(np.float32) * 0.1,
            b2=np.zeros(len(labels), dtype=np.float32),
            labels=labels,
        )

    def save(self, path: str) -> None:
        """One-file checkpoint (the .npz analogue of the reference's
        checkpoint.weights.h5, nametag3_model.py load path)."""
        np.savez(
            path,
            emb=self.emb, w1=self.w1, b1=self.b1, w2=self.w2, b2=self.b2,
            labels=np.array(self.labels, dtype=object),
        )

    @classmethod
    def load(cls, path: str) -> "NpFlatNER":
        with np.load(path, allow_pickle=True) as z:
            return cls(
                emb=z["emb"], w1=z["w1"], b1=z["b1"], w2=z["w2"], b2=z["b2"],
                labels=[str(x) for x in z["labels"]],
            )

    def forward(self, padded_ids: np.ndarray) -> np.ndarray:
        """(batch, seq) int64 with BATCH_PAD → (batch, seq, n_labels)
        float32 logits. Pad positions get all-zero logits (masked)."""
        mask = padded_ids != BATCH_PAD
        ids = np.where(mask, padded_ids, 0) % HASH_DIM
        h = self.emb[ids]  # (B, L, E)
        h = np.maximum(h @ self.w1 + self.b1, 0.0)  # (B, L, H)
        logits = h @ self.w2 + self.b2  # (B, L, C)
        return np.where(mask[..., None], logits, 0.0).astype(np.float32)


# one loaded model per checkpoint path per Python worker (J5)
_MODEL_CACHE: dict[str, NpFlatNER] = {}


def _get_model(path: str) -> NpFlatNER:
    if path not in _MODEL_CACHE:
        _MODEL_CACHE[path] = NpFlatNER.load(path)
    return _MODEL_CACHE[path]


NP_TOKEN_SCHEMA = "conv_id string, turn_idx int, token_idx int, label string"


def score_windows_np(windows: DataFrame, checkpoint_path: str) -> DataFrame:
    """Packed windows → per-token labels from a real logits tensor.

    One ``mapInPandas`` stage per the one-Python-pass rule: dynamic pad →
    batched forward → first-subword gather via word_ids → keyed emission.
    ``checkpoint_path`` must be reachable from every worker (local FS in
    this sandbox; a distributed FS / ``SparkFiles.get`` path on a real
    cluster)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(checkpoint_path)
        labels = model.labels
        for pdf in batches:
            if len(pdf) == 0:
                continue
            padded = pad_batch(pdf["input_ids"].tolist())
            logits = model.forward(padded)
            out_conv: list[str] = []
            out_turn: list[int] = []
            out_tok: list[int] = []
            out_label: list[str] = []
            for row, (conv_id, word_ids, word_keys) in enumerate(
                zip(pdf["conv_id"], pdf["word_ids"], pdf["word_keys"])
            ):
                if len(word_ids) == 0:
                    continue
                first_sub = np.asarray(list(word_ids), dtype=np.int64)
                picks = logits[row, first_sub].argmax(axis=1)
                for key, pick in zip(word_keys, picks):
                    out_conv.append(conv_id)
                    out_turn.append(key["turn_idx"])
                    out_tok.append(key["token_idx"])
                    out_label.append(labels[int(pick)])
            yield pd.DataFrame(
                {
                    "conv_id": out_conv,
                    "turn_idx": out_turn,
                    "token_idx": out_tok,
                    "label": out_label,
                }
            )

    return windows.mapInPandas(fn, schema=NP_TOKEN_SCHEMA)
