"""Unit tests for the round-4 training-data-pipeline additions:
decontamination, PII scrub, Gopher repetition stats."""

from pyspark.sql import functions as F

from nametag3_spark.operators.decontam import decontaminate, word_ngrams
from nametag3_spark.operators.privacy import pii_scrub
from nametag3_spark.operators.textstats import repetition_stats


def test_decontaminate_flags_shared_ngram(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox run away"),  # shares a 4-gram
            (2, "completely different words in this one here"),
            (3, "short doc"),  # shorter than n -> one partial shingle
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, n=4).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["n_overlap"] == 1
    assert not rows[2]["contaminated"] and rows[2]["n_overlap"] == 0
    assert not rows[3]["contaminated"]
    # n_grams is the doc's own distinct shingle count (8 words -> 5)
    assert rows[1]["n_grams"] == 5
    assert rows[3]["n_grams"] == 1  # partial shingle convention


def test_word_ngrams_partial_shingle_edge(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    out = df.select(word_ngrams(F.col("text"), 4).alias("g")).first()["g"]
    assert out == ["a b"]


def test_pii_scrub_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org thanks"),
            (2, "server 192.168.0.1 and call 555-0134 now"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["has_pii"]
    assert "<EMAIL>" in rows[1]["redacted"]
    assert "@" not in rows[1]["redacted"]
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_phone"] == 1
    assert rows[2]["redacted"] == "server <IP> and call <PHONE> now"
    assert rows[3]["has_pii"] is False
    assert rows[3]["redacted"] == "nothing sensitive here"


def test_pii_scrub_email_wins_over_ip_order(spark):
    # the email's dotted-digit local part must be swallowed by <EMAIL>,
    # not half-matched as an IP by the later pattern
    docs = spark.createDataFrame(
        [(1, "x 1.2.3.4@mail.example.com y")], ["doc_id", "text"]
    )
    r = pii_scrub(docs).first()
    assert r["redacted"] == "x <EMAIL> y"
    assert r["n_email"] == 1


def test_repetition_stats_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # 4 identical 2-grams
            (2, "all words here are unique tokens"),  # 5 distinct 2-grams
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    assert rows[1]["n_ngrams"] == 4 and rows[1]["top_count"] == 4
    assert rows[1]["top_ngram_frac"] == 1.0
    assert rows[1]["dup_ngram_frac"] == 0.75
    assert rows[2]["dup_ngram_frac"] == 0.0
    assert rows[2]["top_ngram_frac"] == 0.2


def test_semantic_dedup_keep_list(spark):
    from nametag3_spark.operators.similarity import semantic_dedup

    # two tight clusters + one singleton; ids chosen so min-id keep works
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # dup of 1
        (3, [0.998, 0.02, 0.0]),   # dup of 1 (and of 2 -> one component)
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.999, 0.01]),  # dup of 10
        (99, [0.0, 0.0, 1.0]),     # singleton
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.95, n_centroids=3).collect()
    }
    assert out[1]["keep_id"] == 1 and not out[1]["is_dup"]
    assert out[2]["keep_id"] == 1 and out[2]["is_dup"]
    assert out[3]["keep_id"] == 1 and out[3]["is_dup"]
    assert out[10]["keep_id"] == 10 and not out[10]["is_dup"]
    assert out[11]["keep_id"] == 10 and out[11]["is_dup"]
    assert out[99]["keep_id"] == 99 and not out[99]["is_dup"]


def test_pack_sequences_stream_invariants(spark):
    from nametag3_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 11)))
         for i in range(40)],
        ["doc_id", "text"],
    )
    rows = pack_sequences(docs, budget=16, n_shards=3).collect()
    assert len(rows) == 40
    # Within each shard the doc offsets tile the token stream exactly:
    # sorted by start_tok, each doc starts where the previous one ended.
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= {0, 1, 2}
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in shard_rows:
            assert r["start_tok"] == pos
            assert r["first_chunk"] == pos // 16
            assert r["last_chunk"] == (pos + r["n_tokens"] - 1) // 16
            assert r["spans_boundary"] == (r["last_chunk"] > r["first_chunk"])
            pos += r["n_tokens"]


def test_pack_sequences_partitioning_invariant(spark):
    """Shard assignment and offsets are cluster-size-invariant: the same
    result regardless of input partitioning (the 100 TB determinism
    contract)."""
    from nametag3_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta"[: 5 + (i % 3) * 6]) for i in range(30)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, pack_sequences(docs.repartition(1), budget=8).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), budget=8).collect()))
    assert a == b


def test_repeated_ngram_spans_merges_islands(spark):
    from nametag3_spark.operators.dedup import repeated_ngram_spans

    # docs 1 and 2 share "a b c" AND "b c d" (overlapping 3-grams at
    # positions 1 and 2 of doc 1 -> ONE merged span); doc 3 is disjoint
    docs = spark.createDataFrame(
        [
            (1, "x a b c d y z q"),
            (2, "p a b c d w"),
            (3, "entirely different words here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_hits)
        for r in repeated_ngram_spans(docs, k=3, min_docs=2).collect()
    }
    # doc 1: hits at pos 1 ("a b c") and 2 ("b c d") merge into tokens 1..4
    # doc 2: hits at pos 1 and 2 merge into tokens 1..4
    assert got == {(1, 1, 4, 4, 2), (2, 1, 4, 4, 2)}


def test_repeated_ngram_spans_within_doc_repeat_not_flagged(spark):
    from nametag3_spark.operators.dedup import repeated_ngram_spans

    # the repeated trigram lives in ONE doc only -> min_docs=2 excludes it
    docs = spark.createDataFrame(
        [(1, "a b c x a b c"), (2, "nothing shared at all")],
        "doc_id long, text string",
    )
    assert repeated_ngram_spans(docs, k=3, min_docs=2).count() == 0


def test_repeated_ngram_spans_short_doc_clamped(spark):
    from nametag3_spark.operators.dedup import repeated_ngram_spans

    # 2-word docs with k=3 -> one partial shingle each; span end clamps
    # to the doc's last token, not pos+k-1
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = repeated_ngram_spans(docs, k=3, min_docs=2).collect()
    assert {(r.span_start, r.span_end, r.span_tokens) for r in rows} == {
        (0, 1, 2)
    }


def test_tfidf_top_terms_ranking_and_scores(spark):
    import math

    from nametag3_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=2 df=1 -> 2*ln(3) tops; 'common' df=3 -> score 0 ranks last
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert top1[0].term == "apple"
    assert top1[0].score == round(2 * math.log(3.0), 6)
    assert top1[1].term == "banana"  # tf=1 df=2 -> ln(1.5) beats common's 0
    # doc 3: cherry tf=3 df=2
    top3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert top3[0].term == "cherry"
    assert top3[0].score == round(3 * math.log(3.0 / 2.0), 6)
    assert all(len(v) == 2 for v in by_doc.values())


def test_tfidf_zero_scores_tie_break_lexicographic(spark):
    from nametag3_spark.operators.textstats import tfidf_top_terms

    # every term in every doc -> all scores 0 -> rank purely by term asc
    docs = spark.createDataFrame(
        [(1, "zeta alpha mid"), (2, "mid zeta alpha")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, top_k=3).collect()
    for doc in (1, 2):
        ordered = [r.term for r in sorted(rows, key=lambda r: r.rank) if r.doc_id == doc]
        assert ordered == ["alpha", "mid", "zeta"]
        assert all(r.score == 0.0 for r in rows)
