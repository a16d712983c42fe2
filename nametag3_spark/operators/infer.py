"""Tokenize + score stage: transcripts → per-token nested label stacks.

This is the reference's predict path (nametag3.py:263-269 →
nametag3_model.py:963-1042) re-expressed as ONE ``mapInPandas`` stage:
Arrow batches in, Arrow batches out, no per-row Python at the Spark
surface. The scorer is pluggable:

* ``OracleGazetteerScorer`` — deterministic longest-match tagger over the
  synth gazetteer, emitting CNEC-style stacked nested labels. Used for
  tests/benchmarks (no trained checkpoint ships in this sandbox); it makes
  the *dataflow* verifiable: given identical per-token labels, everything
  downstream (decode → spans → triples → linking → canonical SPO) must
  match the reference bit-for-bit.
* ``HFTransformerScorer`` — the production path faithful to the reference
  model (XLM-R encoder + flat-BIO softmax / seq2seq nested head,
  nametag3_model.py:786-799,940-954). Gated behind an import-try because
  torch/transformers are not in this container; the Spark-side plumbing
  (worker-singleton model per reused Python worker — the reference's
  checkpoint-sharing pattern, nametag3_server.py:437-444 — dynamic padding,
  tagset masks) is laid out and unit-tested with a fake encoder.

Scorers receive TRUECASED, NFC-normalized tokens — the same preprocessing
the reference applies before its tokenizer (nametag3_dataset.py:355-366).
"""

from __future__ import annotations

from typing import Iterator, Protocol

import pandas as pd
from pyspark.sql import DataFrame

from nametag3_spark.data.synth import GAZETTEER
from nametag3_spark.functions.text import prep_tokens
from nametag3_spark.operators.decode import decode_spans

LABELED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, tokens array<string>, labels array<string>, "
    "spans array<struct<label string, start_tok int, end_tok int>>"
)


class Scorer(Protocol):
    def label_batch(self, tokens: list[list[str]]) -> list[list[str]]:
        """Per sentence: truecased tokens → '|'-stacked label strings."""
        ...


class OracleGazetteerScorer:
    """Deterministic greedy longest-match tagger with nested spans.

    Matches both the original alias surface and its truecased-ALL-CAPS
    variant (e.g. ``BANK OF NEW YORK`` truecases to ``Bank Of New York``,
    not ``Bank of New York`` — the scorer must recognize both).
    """

    def __init__(self) -> None:
        # first_token → [(alias_tokens, outer_type, nested)] longest-first
        self._by_first: dict[str, list[tuple[tuple[str, ...], str, tuple | None]]] = {}
        for _eid, etype, aliases in GAZETTEER:
            for toks, nested in aliases:
                variants = {tuple(toks), tuple(t.lower().title() for t in toks)}
                for var in variants:
                    self._by_first.setdefault(var[0], []).append(
                        (var, etype, nested)
                    )
        for key in self._by_first:
            self._by_first[key].sort(key=lambda e: -len(e[0]))

    def _label_sentence(self, tokens: list[str]) -> list[str]:
        stacks: list[list[str]] = [[] for _ in tokens]
        i = 0
        n = len(tokens)
        while i < n:
            matched = False
            for alias, etype, nested in self._by_first.get(tokens[i], ()):  # longest first
                k = len(alias)
                if i + k <= n and tuple(tokens[i : i + k]) == alias:
                    for p in range(k):
                        stacks[i + p].append(("B-" if p == 0 else "I-") + etype)
                    if nested is not None:
                        noff, nlen, ntype, _neid = nested
                        for p in range(nlen):
                            stacks[i + noff + p].append(
                                ("B-" if p == 0 else "I-") + ntype
                            )
                    i += k
                    matched = True
                    break
            if not matched:
                i += 1
        return ["|".join(s) if s else "O" for s in stacks]

    def label_batch(self, tokens: list[list[str]]) -> list[list[str]]:
        return [self._label_sentence(sent) for sent in tokens]


class HFTransformerScorer:
    """XLM-R flat-softmax scorer (production path): HF tokenizer offsets →
    padded batch → forward → argmax at each word's FIRST subword.

    Reference contract: forward + head (nametag3_model.py:786-799), the
    first-subword/word_ids gather (nametag3_model.py:940-954), and the
    one-tag-per-token batch protocol (nametag3_model.py:963-1042).

    Requires torch + transformers. They are absent in this container, so
    CI drives this exact body with faked modules
    (tests/test_hf_adapter.py) — the fakes implement the same tokenizer/
    model surface (``word_ids``, ``logits.detach().cpu().numpy()``), so a
    real checkpoint needs no code change here.
    """

    def __init__(self, checkpoint_dir: str) -> None:
        try:
            import torch
            import transformers
        except ImportError as exc:
            raise NotImplementedError(
                "HFTransformerScorer needs torch+transformers (not in this "
                "container). Use OracleGazetteerScorer for the verifiable "
                "dataflow; the packing/inference plumbing is in encode.py."
            ) from exc
        self.torch = torch
        self.checkpoint_dir = checkpoint_dir
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(checkpoint_dir)
        self.model = transformers.AutoModelForTokenClassification.from_pretrained(
            checkpoint_dir
        )
        self.model.eval()
        self.id2label = dict(self.model.config.id2label)

    def encode_words(self, sentences: list[list[str]]):
        """Pre-split words → (encoding, first_subword_positions): the
        HF-offsets adapter. ``first[i][w]`` is the padded-sequence index
        of word w's first subword in row i (word_ids carries the map;
        continuation subwords and specials/pads are skipped)."""
        enc = self.tokenizer(
            sentences,
            is_split_into_words=True,
            padding=True,
            truncation=True,
            return_tensors="pt",
        )
        first: list[list[int]] = []
        for i in range(len(sentences)):
            seen: set[int] = set()
            firsts: list[int] = []
            for pos, wid in enumerate(enc.word_ids(i)):
                if wid is not None and wid not in seen:
                    seen.add(wid)
                    firsts.append(pos)
            first.append(firsts)
        return enc, first

    def label_batch(self, tokens: list[list[str]]) -> list[list[str]]:
        nonempty = [t for t in tokens if t]
        if not nonempty:
            return [[] for _ in tokens]
        enc, first = self.encode_words(nonempty)
        with self.torch.no_grad():
            logits = self.model(**enc).logits
        logits = logits.detach().cpu().numpy()
        rows = iter(range(len(nonempty)))
        out: list[list[str]] = []
        for t in tokens:
            if not t:
                out.append([])
                continue
            i = next(rows)
            picks = logits[i][first[i]].argmax(axis=-1)
            labs = [self.id2label[int(p)] for p in picks]
            # truncation can only drop TAIL words (the packer keeps
            # windows under the model budget, so this is defensive)
            labs += ["O"] * (len(t) - len(labs))
            out.append(labs)
        return out


# module-level scorer cache: one instance per reused Python worker
# (reference: models with the same path share one loaded instance,
#  nametag3_server.py:437-444)
_SCORER_CACHE: dict[str, Scorer] = {}


def _get_scorer(name: str) -> Scorer:
    if name not in _SCORER_CACHE:
        if name == "oracle":
            _SCORER_CACHE[name] = OracleGazetteerScorer()
        elif name.startswith("hf:"):
            # "hf:<checkpoint_dir>" — the production transformer path;
            # one instance per checkpoint per reused Python worker (J5)
            _SCORER_CACHE[name] = HFTransformerScorer(name[3:])
        else:
            raise ValueError(f"unknown scorer: {name}")
    return _SCORER_CACHE[name]


def _annotate_batches(scorer_name: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = _get_scorer(scorer_name)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # S4 tokenization + P3 NFC/truncate + P4 truecase
            token_lists = [
                prep_tokens(t) if isinstance(t, str) and t else []
                for t in pdf["text"]
            ]
            labels = scorer.label_batch(token_lists)
            # decode fused into the same Python pass: one Arrow round-trip
            # for tokenize+score+decode (chaining two Python stages in one
            # Spark plan costs a second serialization boundary)
            spans = [
                [
                    {"label": typ, "start_tok": s, "end_tok": e}
                    for typ, s, e in decode_spans(stacks)
                ]
                for stacks in labels
            ]
            out = pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].copy()
            out["tokens"] = token_lists
            out["labels"] = labels
            out["spans"] = spans
            yield out

    return fn


def annotate_turns(transcripts: DataFrame, scorer: str = "oracle") -> DataFrame:
    """transcripts → + tokens:array<string> + labels:array<string> (stacked)."""
    return transcripts.mapInPandas(_annotate_batches(scorer), schema=LABELED_SCHEMA)


MENTION_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, ts timestamp, "
    "label string, start_tok int, end_tok int, surface string"
)


def _mention_batches(scorer_name: str):
    """Arrow-native fused pass: only ``text`` is materialized into Python
    strings (the tokenizer needs them); every carried column replicates
    per mention via zero-copy ``Array.take`` and the output batch is
    built directly as Arrow — no pandas round-trip on either side
    (guide §4.2: measured ~12% warm / ~35% cold over the pandas form on
    the 1.1M-turn bench job, rows identical)."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        scorer = _get_scorer(scorer_name)
        for batch in batches:
            nrow = batch.num_rows
            if nrow == 0:
                continue
            texts = batch.column("text").to_pylist()
            counts = np.empty(nrow, dtype=np.int64)
            labels_flat: list[str] = []
            starts_flat: list[int] = []
            ends_flat: list[int] = []
            surfaces_flat: list[str] = []
            for i, text in enumerate(texts):
                tokens = prep_tokens(text) if isinstance(text, str) and text else []
                spans = decode_spans(scorer.label_batch([tokens])[0])
                counts[i] = len(spans)
                for typ, s, e in spans:
                    labels_flat.append(typ)
                    starts_flat.append(s)
                    ends_flat.append(e)
                    surfaces_flat.append(" ".join(tokens[s : e + 1]))
            idx = pa.array(np.repeat(np.arange(nrow), counts))
            arrs = [
                batch.column(c).take(idx)
                for c in ("conv_id", "turn_idx", "role", "tool", "ts")
            ]
            arrs += [
                pa.array(labels_flat, type=pa.string()),
                pa.array(starts_flat, type=pa.int32()),
                pa.array(ends_flat, type=pa.int32()),
                pa.array(surfaces_flat, type=pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrs,
                names=[
                    "conv_id", "turn_idx", "role", "tool", "ts",
                    "label", "start_tok", "end_tok", "surface",
                ],
            )

    return fn


def extract_mentions_flat(
    transcripts: DataFrame,
    scorer: str = "oracle",
    rebalance: bool | str = "auto",
) -> DataFrame:
    """Fused tokenize→score→decode→explode in ONE Python pass emitting
    flat primitive columns — no array/struct columns cross the Arrow
    boundary, which is ~10× cheaper per turn than shipping token/label/
    span lists and exploding JVM-side. This is the throughput path; the
    staged ``annotate_turns`` → ``extract_mentions`` path (which
    materializes tokens/labels for snapshots and debugging) must produce
    identical mention rows (tested).

    ``rebalance`` hash-repartitions on (conv_id, turn_idx) first: scoring
    is per-turn independent, so turn-level hash partitioning neutralizes
    hot-conversation skew (a conversation 20× the average would otherwise
    pin one task per hot conv). The default ``"auto"`` (round-6
    measurement) repartitions only when the input is NARROWER than the
    cluster's slots: on an already-wide input the pre-Python shuffle of
    the full text column cost ~10-20% of the pipeline wall while buying
    nothing — with hundreds of partitions a hot conversation is confined
    to one partition among many, which per-turn scoring tolerates.
    ``True`` forces the shuffle (an input with pathological
    partition-level skew), ``False`` never shuffles."""
    from pyspark.sql import functions as F

    if rebalance == "auto":
        target = transcripts.sparkSession.sparkContext.defaultParallelism
        rebalance = transcripts.rdd.getNumPartitions() < target
    if rebalance:
        n_parts = transcripts.sparkSession.sparkContext.defaultParallelism * 2
        transcripts = transcripts.repartition(n_parts, F.col("conv_id"), F.col("turn_idx"))
    out = transcripts.mapInArrow(_mention_batches(scorer), schema=MENTION_SCHEMA)
    return out.withColumn("mention_norm", F.lower(F.col("surface")))


# --------------------------------------------------------------------------
# Windowed inference path (T1/T3/T4/T6 + J1): score PACKED windows, realign
# per-word labels back to turns via the carried (turn_idx, token_idx) keys.
# This is the production shape for a transformer scorer — the model sees
# ≤max_len subword windows, not turns — and must produce exactly the same
# mentions as the per-turn path (reference packing nametag3_dataset.py:
# 273-306 + realignment nametag3_model.py:963-1042, re-expressed as a
# relational key join instead of an index walk).
# --------------------------------------------------------------------------

WINDOW_TOKEN_SCHEMA = (
    "conv_id string, turn_idx int, token_idx int, word string, label string"
)


def score_windows(windows: DataFrame, scorer: str = "oracle") -> DataFrame:
    """Packed windows → per-token labels keyed by (conv_id, turn_idx,
    token_idx).

    Windows pack WHOLE turns (continuations only for oversized turns), so
    labeling runs per turn-segment inside each window — the per-window
    batch is what a transformer forward pass would consume (input_ids are
    in the window; the oracle scorer consumes the carried word strings).

    Continuation merging: a turn longer than the window budget splits
    into continuation windows; scoring those segments INDEPENDENTLY would
    let a context-sensitive scorer tag a boundary-spanning entity
    inconsistently across the split. So the trailing segment of each
    window is held PENDING and merged with the next window's leading
    segment when it continues the same (conv_id, turn_idx) — ``label_
    batch`` then sees the whole turn, and window-path output equals the
    per-turn path even past the window budget (pytest-locked with an
    oversized turn). Memory stays O(one turn): only the open tail is
    buffered, never a partition.

    Precondition: windows of one conversation are CONTIGUOUS and ordered
    within their partition — true by construction for
    ``pack_conversations`` output (``groupBy(conv_id).applyInPandas``
    emits each group's windows consecutively, in window_idx order, and
    ``mapInPandas`` streams partition rows in order). Under an arbitrary
    re-shuffle the merge degrades gracefully to independent segment
    scoring (the pre-round-4 behavior).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sc = _get_scorer(scorer)
        # open tail of the previous window: may continue in the next one
        pend_conv: str | None = None
        pend_turn: int = -1
        pend_words: list[str] = []
        pend_toks: list[int] = []

        def make_frame(out):
            return pd.DataFrame(
                {
                    "conv_id": out[0],
                    "turn_idx": out[1],
                    "token_idx": out[2],
                    "word": out[3],
                    "label": out[4],
                }
            )

        def flush(out) -> None:
            nonlocal pend_conv, pend_words, pend_toks
            if pend_conv is None:
                return
            labels = sc.label_batch([pend_words])[0]
            for w, tok, lab in zip(pend_words, pend_toks, labels):
                out[0].append(pend_conv)
                out[1].append(pend_turn)
                out[2].append(tok)
                out[3].append(w)
                out[4].append(lab)
            pend_conv, pend_words, pend_toks = None, [], []

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: tuple[list, list, list, list, list] = ([], [], [], [], [])
            for conv_id, word_keys, words in zip(
                pdf["conv_id"], pdf["word_keys"], pdf["words"]
            ):
                # consecutive same-turn runs = turn segments
                seg_start = 0
                nkeys = len(word_keys)
                for i in range(1, nkeys + 1):
                    if (
                        i < nkeys
                        and word_keys[i]["turn_idx"]
                        == word_keys[seg_start]["turn_idx"]
                    ):
                        continue
                    turn_idx = int(word_keys[seg_start]["turn_idx"])
                    seg_words = list(words[seg_start:i])
                    seg_toks = [
                        int(word_keys[p]["token_idx"])
                        for p in range(seg_start, i)
                    ]
                    if pend_conv == conv_id and pend_turn == turn_idx:
                        pend_words.extend(seg_words)
                        pend_toks.extend(seg_toks)
                    else:
                        flush(out)
                        pend_conv, pend_turn = conv_id, turn_idx
                        pend_words, pend_toks = seg_words, seg_toks
                    # a turn followed by another segment in the SAME
                    # window is closed — only the window's tail can
                    # continue into the next window
                    if i < nkeys:
                        flush(out)
                    seg_start = i
            if out[0]:
                yield make_frame(out)
        out = ([], [], [], [], [])
        flush(out)
        if out[0]:
            yield make_frame(out)

    return windows.mapInPandas(fn, schema=WINDOW_TOKEN_SCHEMA)


WINDOW_MENTION_SCHEMA = (
    "conv_id string, turn_idx int, label string, start_tok int, "
    "end_tok int, surface string"
)


def mentions_from_window_tokens(token_labels: DataFrame) -> DataFrame:
    """Realign (J1): per-token window labels → per-turn decoded mentions.

    The shuffle key is (conv_id, turn_idx); in-group order comes from the
    carried token_idx — stable regardless of window/partition order. The
    flagship throughput path stays the fused single-Python-pass
    ``extract_mentions_flat``; this is the window-path equivalence proof.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("token_idx")
        tokens = pdf["word"].tolist()
        labels = pdf["label"].tolist()
        conv_id = pdf["conv_id"].iloc[0]
        turn_idx = int(pdf["turn_idx"].iloc[0])
        rows = []
        for typ, s, e in decode_spans(labels):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "label": typ,
                    "start_tok": s,
                    "end_tok": e,
                    "surface": " ".join(tokens[s : e + 1]),
                }
            )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "turn_idx", "label", "start_tok", "end_tok", "surface",
            ],
        )

    return token_labels.groupBy("conv_id", "turn_idx").applyInPandas(
        fn, schema=WINDOW_MENTION_SCHEMA
    )
