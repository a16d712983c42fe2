"""Label vocabulary, tagsets, and tagset masks (SURVEY.md §1.1, P6-P8).

The reference seeds its dynamic vocabulary with five control labels
(ids 0-4), grows it while reading training data, freezes it at inference
(unseen → ``<unk>``), and persists it in ``mappings.pickle``
(nametag3_dataset.py:31-39,154-158,211-219,332-345). Here the vocabulary
is a plain dict broadcast to executors and persisted as JSON next to the
model artifacts (the S5 model/checkpoint-source contract); tagset masks
are NumPy additive masks (0 valid / -1e9 invalid) applied inside the
inference UDF, exactly the multitagset mechanism of
nametag3_dataset.py:44-54,586-605.
"""

from __future__ import annotations

import json
import os

import numpy as np

MASK, COLUMN_PAD, UNK, EOW, BOS = 0, 1, 2, 3, 4
CONTROL_LABELS = ["<mask>", "<pad>", "<unk>", "<eow>", "<bos>"]

# the reference's three hard-coded multitagset inventories
# (nametag3_dataset.py:44-54)
TAGSETS: dict[str, list[str]] = {
    "conll": ["B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC",
              "B-MISC", "I-MISC", "O"],
    "uner": ["B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC", "O"],
    "onto": ["O"] + [
        p + t
        for t in ["PERSON", "NORP", "FAC", "ORG", "GPE", "LOC", "PRODUCT",
                  "DATE", "TIME", "PERCENT", "MONEY", "QUANTITY", "ORDINAL",
                  "CARDINAL", "EVENT", "WORK_OF_ART", "LAW", "LANGUAGE"]
        for p in ("B-", "I-")
    ],
}

MASK_INVALID = -1e9


class LabelVocab:
    """Frozen-at-inference label vocabulary with <unk> fallback (P7)."""

    def __init__(self, labels: list[str] | None = None) -> None:
        self.id2label: list[str] = list(CONTROL_LABELS)
        self.label2id: dict[str, int] = {l: i for i, l in enumerate(self.id2label)}
        self.frozen = False
        for lab in labels or []:
            self.add(lab)

    def add(self, label: str) -> int:
        if label in self.label2id:
            return self.label2id[label]
        if self.frozen:
            return UNK
        self.label2id[label] = len(self.id2label)
        self.id2label.append(label)
        return self.label2id[label]

    def freeze(self) -> "LabelVocab":
        self.frozen = True
        return self

    def get(self, label: str) -> int:
        """Frozen lookup: unseen labels map to <unk> (nametag3_dataset.py:211-213)."""
        return self.label2id.get(label, UNK)

    # ------------------------------------------------- tagset machinery

    def tagset_mask(self, tagset: str) -> np.ndarray:
        """Additive logit mask: 0 for labels valid in ``tagset`` (suffixed
        ``-{tagset}`` in the shared vocab, ``O`` bare), -1e9 otherwise —
        nametag3_dataset.py:586-605."""
        mask = np.full(len(self.id2label), MASK_INVALID, dtype=np.float32)
        for tag in TAGSETS[tagset]:
            key = tag if tag == "O" else f"{tag}-{tagset}"
            if key in self.label2id:
                mask[self.label2id[key]] = 0.0
        return mask

    @staticmethod
    def suffix_for_tagset(label: str, tagset: str) -> str:
        """P6: non-O gold labels are suffixed with their tagset."""
        return label if label == "O" else f"{label}-{tagset}"

    @staticmethod
    def strip_tagset_suffix(label: str) -> str:
        """P8: ``B-PER-conll`` → ``B-PER`` on output (rsplit once)."""
        if label == "O" or "-" not in label:
            return label
        head, _, tail = label.rpartition("-")
        return head if tail in TAGSETS else label

    # ------------------------------------------------- persistence (S5)

    def save(self, model_dir: str) -> str:
        """JSON replacement for mappings.pickle, next to options.json."""
        os.makedirs(model_dir, exist_ok=True)
        path = os.path.join(model_dir, "mappings.json")
        with open(path, "w") as fh:
            json.dump({"id2label": self.id2label, "frozen": self.frozen}, fh)
        return path

    @classmethod
    def load(cls, model_dir: str) -> "LabelVocab":
        with open(os.path.join(model_dir, "mappings.json")) as fh:
            data = json.load(fh)
        vocab = cls()
        for lab in data["id2label"][len(CONTROL_LABELS):]:
            vocab.add(lab)
        if data.get("frozen"):
            vocab.freeze()
        return vocab


def save_model_options(model_dir: str, options: dict) -> str:
    """options.json — train-args transfer contract (nametag3.py:155-162)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "options.json")
    with open(path, "w") as fh:
        json.dump(options, fh, indent=1, sort_keys=True)
    return path


def load_model_options(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "options.json")) as fh:
        return json.load(fh)
