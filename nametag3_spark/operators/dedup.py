"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard near-dup — all over a
``documents(doc_id, text, ...)`` table, all built from JVM-side SQL
functions (no Python in the hot path):

* exact: hash-groupBy on the normalized text; keeps min doc_id.
* MinHash-LSH: word-shingle signatures via ``xxhash64`` with per-
  permutation salts, banded; doc pairs sharing a band bucket are
  candidates, verified by true shingle Jaccard. One shuffle on band keys.
* SimHash: 64-bit sign-aggregated token hashes; near-dups = identical
  simhash prefix buckets (Hamming verification on candidates).
* n-gram Jaccard: direct verified similarity for candidate pairs.

At 100 TB the LSH path is the scale path: signatures are computed in one
projection pass, the band join is an equi-join AQE can split on skew, and
verification touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# Modulus for the "portable" hash family: 2^31-1 (Mersenne prime). Every
# intermediate of (a*h + b) % P with a, h, b < P stays under 2^62, so the
# identical integer arithmetic runs overflow-free on Spark AND DuckDB
# bigints — what makes the full banded-LSH pipeline cross-engine
# verifiable (same trick as simhash's portable md5 word hash).
PORTABLE_PRIME = 2_147_483_647

# Intermediates persisted by the pair builders (hash arrays, band tables)
# feed multiple plan branches, so they must stay cached until the caller
# COLLECTS the returned DataFrame — the builders cannot unpersist them
# before their own lazy result is consumed. Ownership contract: every
# builder registers its handles here; callers release them AFTER the
# consuming action via unpersist_intermediates() (minhash_recall invokes
# both the LSH and exact builders, so one audit otherwise leaves 3+
# cached datasets in executor storage for the session).
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_intermediates(blocking: bool = False) -> int:
    """Release every intermediate this module has persisted; returns the
    number released. Call after collecting/writing the consuming query."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking)
        n += 1
    return n


def checkpoint_and_release(df: DataFrame) -> DataFrame:
    """Eagerly materialize a SMALL pair/audit result, then free the
    corpus-scale intermediates its builders persisted.

    The builders cannot unpersist before their lazy result is consumed,
    and a caller that only ever hands the DataFrame onward (the driver
    contract) never gets a post-action hook — so in a long session each
    audit invocation would strand 3+ cached datasets in executor storage
    (round-3 ADVICE). ``localCheckpoint(eager=True)`` runs the plan NOW,
    with every intermediate cache still warm (full sharing benefit),
    stores only the bounded result (pair sets/recall rows ≪ corpus by
    construction — the result stays distributed, nothing is collected),
    and cuts the lineage so the registry can be drained immediately; the
    checkpoint itself is reaped by Spark's ContextCleaner once the
    DataFrame is dropped. Callers whose consuming action is their own
    (tests, jobs) can keep calling ``unpersist_intermediates`` directly
    instead."""
    out = df.localCheckpoint(eager=True)
    unpersist_intermediates()
    return out


def _word_shingles(col: str = "text", k: int = 3):
    """k-word shingles as array<string> (distinct)."""
    words = F.split(F.lower(F.col(col)), r"\s+")
    n = F.size(words)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min id per identical normalized text.

    groupBy on a 64-bit content hash first (cheap shuffle key), then the
    full text inside the group to be collision-safe.
    """
    normalized = F.lower(F.trim(F.col(text_col)))
    return (
        docs.withColumn("_content_hash", F.xxhash64(normalized))
        .groupBy("_content_hash", normalized.alias("_norm_text"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


def minhash_signature_expr(
    hashed_col, n_hashes: int = N_HASHES, portable: bool = False
):
    """MinHash signature over PRE-HASHED shingles (array<long>):
    ``transform(0..n-1, p -> array_min(transform(hs, h -> xxhash64(h, p))))``.

    Two-level hashing: each shingle STRING is hashed once upstream
    (``_hs = transform(sh, s -> xxhash64(s))``); the n permutations mix
    the 8-byte hash, not the string — n× less string hashing, the
    standard MinHash trick. One nested expression, not n parallel
    subtrees: a flat ``array(min0, min1, …)`` codegens an n×-bigger
    method and dominates compile time. (The inner lambda takes ONE arg on
    purpose: 2-arg F.transform lambdas mean (element, index), which would
    rebind the permutation id.)

    ``portable=True`` swaps the xxhash64 mixer for the classic affine
    permutation family ``(a_p*h + b_p) % P`` over P=2^31-1 — byte-for-
    byte reproducible in DuckDB SQL, so the whole signature (and the
    banding built on it) gets an oracle twin. xxhash64 stays the 100 TB
    fast path (JVM intrinsic, no modular arithmetic)."""
    if portable:
        P = PORTABLE_PRIME

        def perm(p):
            # sequence() yields 32-bit ints — widen BEFORE multiplying,
            # or (p+1)*1103515245 overflows int under ANSI mode
            p64 = p.cast("long")
            a = ((p64 + 1) * F.lit(1103515245) + 12345) % P
            b = ((p64 + 1) * F.lit(12345) + 67890) % P
            return lambda h: (a * h + b) % P

        return F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda p: F.array_min(F.transform(hashed_col, perm(p))),
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda p: F.array_min(F.transform(hashed_col, lambda h: F.xxhash64(h, p))),
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    hs = F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
    return (
        docs.withColumn("_sh", _word_shingles(text_col, k))
        .where(F.size("_sh") > 0)
        .select(
            F.col(id_col),
            F.col("_sh"),
            minhash_signature_expr(hs).alias("sig"),
        )
    )


def _parallelize_if_narrow(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by key iff the input has fewer partitions than the
    cluster has slots (e.g. a single small parquet file): the downstream
    shingle/signature projection is CPU-bound and must not serialize on
    one task. At warehouse scale the input is already wide → no-op, no
    shuffle."""
    from nametag3_spark.operators.skew import spread_if_narrow

    return spread_if_narrow(df, key_col)


def _shingle_rows(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, _s) rows: one row per k-word shingle OCCURRENCE — the
    explode/codegen form of ``_word_shingles``.

    Why rows instead of a per-doc array pipeline: nested higher-order
    functions (transform/slice/concat_ws lambdas) are interpreted
    per-element with object churn — measured 3.5-4.5× slower than this
    explode + WholeStageCodegen shape on the same data (guide §1/§4:
    prefer codegen'd built-ins over interpreted per-element paths).
    Duplicate shingle occurrences are harmless downstream: signature
    minima ignore multiplicity and ``collect_set`` dedups the verify
    payloads, so results are bit-identical to the distinct-array form
    (``array_intersect``/``array_union`` deduplicate anyway)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    shingle = F.concat_ws(" ", F.slice(F.col("_w"), F.col("_i") + 1, k))
    return (
        _parallelize_if_narrow(docs, id_col)
        .select(F.col(id_col), words.alias("_w"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("_w") - k, F.lit(0)))
            ).alias("_i"),
            F.col("_w"),
        )
        .select(F.col(id_col), shingle.alias("_s"))
    )


def _shingle_hash_rows(
    docs: DataFrame, id_col: str, text_col: str, k: int, portable: bool
) -> DataFrame:
    """(id, _h) rows: ``_shingle_rows`` with each shingle hashed by the
    requested family (xxhash64 fast path / md5-affine portable path) as a
    plain codegen'd expression."""
    if portable:
        h = (
            F.conv(F.substring(F.md5("_s"), 1, 15), 16, 10).cast("bigint")
            % PORTABLE_PRIME
        )
    else:
        h = F.xxhash64("_s")
    return _shingle_rows(docs, id_col, text_col, k).select(
        F.col(id_col), h.alias("_h")
    )


def _portable_perm_consts(p: int) -> tuple[int, int]:
    """The classic affine family's (a_p, b_p) — same arithmetic as the
    Spark-expression form in ``minhash_signature_expr`` (and the DuckDB
    oracle twins), precomputed driver-side so the per-row work is one
    multiply-add-mod instead of re-deriving the constants per element."""
    a = ((p + 1) * 1103515245 + 12345) % PORTABLE_PRIME
    b = ((p + 1) * 12345 + 67890) % PORTABLE_PRIME
    return a, b


def _hashed_sigs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    portable: bool,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """One row per doc: (id, _hs: distinct shingle-hash set, _m0.._m{n-1}:
    MinHash signature minima) — computed in ONE codegen'd hash aggregate
    over the exploded shingle rows. The per-permutation hash runs as a
    plain expression inside partial (map-side) aggregation, so the heavy
    hashing is spread over every scan/repartition task and the exchange
    carries only one pre-aggregated row per (doc, partition)."""
    rows = _shingle_hash_rows(docs, id_col, text_col, k, portable)
    if portable:
        mins = []
        for p in range(n_hashes):
            a, b = _portable_perm_consts(p)
            mins.append(
                F.min((F.lit(a) * F.col("_h") + F.lit(b)) % PORTABLE_PRIME)
                .alias(f"_m{p}")
            )
    else:
        mins = [
            F.min(F.xxhash64(F.col("_h"), F.lit(p))).alias(f"_m{p}")
            for p in range(n_hashes)
        ]
    return rows.groupBy(id_col).agg(
        F.collect_set("_h").alias("_hs"), *mins
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    k: int = 3,
    bucket_cap: int = 2000,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded MinHash.

    Scale shape (the part that survives 100 TB):

    * the band self-join and the pair-dedup carry ONLY
      ``(band_idx, band_hash, id)`` — 24-byte rows. Shingle sets are
      re-joined by doc id AFTER ``dropDuplicates(id_a, id_b)``, so the
      fat payload never rides the candidate shuffle and hot band-buckets
      are quadratic in row COUNT, not in document size.
    * hot-bucket guard: any ``(band_idx, band_hash)`` bucket holding more
      than ``bucket_cap`` docs is skipped (standard LSH skew cap — such
      buckets are degenerate, e.g. boilerplate shingles; true near-dups
      in them almost always share another, smaller band bucket). The hot
      key set is tiny by construction → broadcast anti-join.

    ``hashed`` and ``bands`` feed multiple plan branches (hot-key scan,
    both join sides, verify re-join), so both are persisted — the
    shingle+hash pass runs ONCE, not once per branch. The persisted
    payload is ``array<long>`` (one xxhash64 per distinct shingle), NOT
    the shingle strings: signatures, the band join, AND the Jaccard
    verification all run on the 8-byte hashes — the string pass happens
    exactly once and nothing string-sized is cached or shuffled.
    (xxhash64 collisions are negligible for Jaccard estimation; this is
    the standard large-scale dedup representation.) At warehouse scale
    you'd materialize the hash arrays as a table; persist is the
    in-session equivalent.

    ``word_hash="portable"`` switches every hash in the pipeline (shingle
    hash, permutations, band hash) to md5/affine-mod-P arithmetic that
    DuckDB evaluates identically — the cross-engine-verification mode;
    "xxhash64" (default) is the JVM-intrinsic 100 TB fast path.
    """
    portable = word_hash == "portable"
    # one codegen'd pass: shingle rows → per-doc (hash set, 16 minima).
    # ``hashed`` (the verify payload + signature columns) is the only
    # corpus-scale intermediate and feeds three branches, so it persists.
    hashed = _persist(_hashed_sigs(docs, id_col, text_col, k, portable))

    def band_hash(b: int):
        rows = [
            F.col(f"_m{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)
        ]
        if portable:
            acc = rows[0]
            for m in rows[1:]:
                acc = (acc * 31 + m) % PORTABLE_PRIME
            return acc
        return F.xxhash64(*rows)

    bands = hashed.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        band_hash(b).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    bands = _persist(bands)

    hot = (
        bands.groupBy("band_idx", "band_hash")
        .count()
        .where(F.col("count") > bucket_cap)
        .select("band_idx", "band_hash")
    )
    bands = bands.join(F.broadcast(hot), ["band_idx", "band_hash"], "left_anti")

    left = bands.select("band_idx", "band_hash", F.col(id_col).alias("id_a"))
    right = bands.select("band_idx", "band_hash", F.col(id_col).alias("id_b"))
    cands = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    sh_a = hashed.select(F.col(id_col).alias("id_a"), F.col("_hs").alias("_hs_a"))
    sh_b = hashed.select(F.col(id_col).alias("id_b"), F.col("_hs").alias("_hs_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_hs_a", "_hs_b"))
            / F.size(F.array_union("_hs_a", "_hs_b")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    k: int = 3,
) -> DataFrame:
    """EXACT near-dup pairs (id_a < id_b, true Jaccard ≥ threshold) via
    shared-shingle inverted-index blocking — no LSH approximation.

    Exactness: Jaccard ≥ t > 0 implies the pair shares ≥1 shingle, so an
    equi-join on exploded shingles generates a candidate superset; true
    Jaccard verification then runs only on those candidates. This is the
    DuckDB-oracle-able twin of ``minhash_lsh_pairs`` and the recall
    denominator for the LSH path. Candidate volume is Σ count(shingle)²
    over shared shingles — fine at verification SFs; the LSH path is the
    100 TB shape.
    """
    # explode + one codegen'd collect_set aggregate instead of the
    # interpreted HOF shingle pipeline (see _shingle_rows); the distinct
    # per-doc shingle SET is identical, so inverted index, candidates,
    # and Jaccard are unchanged (measured ~2× at sf0.1, rows identical)
    shingled = _shingle_rows(docs, id_col, text_col, k).groupBy(
        id_col
    ).agg(F.collect_set("_s").alias("_sh"))
    shingled = _persist(shingled)
    inv = shingled.select(
        F.col(id_col), F.explode("_sh").alias("_shingle")
    )
    cands = (
        inv.alias("a")
        .join(inv.alias("b"), "_shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = shingled.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    sh_b = shingled.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_recall(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    k: int = 3,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """One-row recall audit of the LSH path against the exact pair set:
    (n_exact, n_lsh, n_hit, recall, precision). Run at verification SFs —
    quantifies what the banded approximation misses instead of asserting
    nothing. With ``word_hash="portable"`` BOTH inputs of the audit have
    DuckDB twins (the portable banded pipeline + the exact inverted-index
    pair set), so the recall/precision row itself is cross-engine
    verifiable, not just its ingredients."""
    lsh = minhash_lsh_pairs(
        docs, id_col, text_col, jaccard_threshold, k, word_hash=word_hash
    )
    exact = jaccard_pairs_exact(docs, id_col, text_col, jaccard_threshold, k)
    hit = lsh.select("id_a", "id_b").intersect(exact.select("id_a", "id_b"))
    counts = (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(lsh.agg(F.count(F.lit(1)).alias("n_lsh")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
    )
    return counts.select(
        "n_exact",
        "n_lsh",
        "n_hit",
        F.round(F.col("n_hit") / F.greatest("n_exact", F.lit(1)), 4).alias("recall"),
        F.round(F.col("n_hit") / F.greatest("n_lsh", F.lit(1)), 4).alias("precision"),
    )


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs → per-document keep decision: ``(doc_id, keep_id,
    is_dup)`` for EVERY input document, where ``keep_id`` is the smallest
    doc id in the document's near-duplicate connected component (itself
    for singletons). This is the artifact a training-data pipeline
    actually consumes — the drop/keep list — not the raw pair set.

    Scale shape: the pair set is already blocked+verified (LSH output),
    orders of magnitude smaller than the corpus; connected_components
    runs driver-side union-find under a collected-edge bound and flips to
    distributed pointer jumping above it. The corpus-side join is a
    left join on doc id — one shuffle of (id, component), never of text.
    The component label is computed over STRING ids (CC's key domain);
    ``keep_id`` is re-derived as the min of the ORIGINAL typed ids per
    component, so lexicographic vs numeric ordering never leaks into the
    result.
    """
    from nametag3_spark.operators.canonicalize import connected_components

    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    id_type = docs.schema[id_col].dataType
    comp = connected_components(edges)  # (node, component) strings
    keep = comp.groupBy("component").agg(
        F.min(F.col("node").cast(id_type)).alias("keep_id")
    )
    # dup_map has one row per DUP doc only — tiny next to the corpus. No
    # F.broadcast hint on purpose: its size is data-dependent (the
    # unguarded-broadcast trap), and AQE promotes the join to broadcast
    # at runtime exactly when the map measures small.
    dup_map = comp.join(keep, "component").select(
        F.col("node").cast(id_type).alias(id_col), "keep_id"
    )
    return (
        docs.select(id_col)
        .join(dup_map, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("keep_id"), F.col(id_col)).alias("keep_id"),
        )
        .withColumn("is_dup", F.col(id_col) != F.col("keep_id"))
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """n_bits SimHash per doc: per-bit majority sign over word hashes.

    One aggregate over the word-hash ARRAY — each word is hashed once
    (not once per bit as a naive per-bit formulation would): the
    accumulator is an int count per bit, finished by folding majority
    signs into one long. Still a single compact expression (64 parallel
    aggregate subtrees would dominate compile time).

    word_hash:
      - "xxhash64" (default): JVM-intrinsic — the 100 TB fast path.
      - "portable": top 60 bits of md5 (``conv`` of 15 hex chars),
        expressible identically in DuckDB ``CAST('0x'||substr(md5(w),1,15)
        AS BIGINT)`` — the cross-engine-verifiable path; n_bits caps at 60.
    """
    if word_hash == "portable":
        n_bits = min(n_bits, 60)
        wh = "cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)"
    else:
        wh = "xxhash64(w)"
    sim = F.expr(
        f"""
        aggregate(
          transform(array_distinct(split(lower({text_col}), '\\\\s+')), w -> {wh}),
          cast(array_repeat(0, {n_bits}) as array<int>),
          (acc, h) -> zip_with(acc, sequence(0, {n_bits - 1}),
                               (c, b) -> c + if((shiftright(h, b) & 1) = 1, 1, -1)),
          acc -> aggregate(
                   zip_with(acc, sequence(0, {n_bits - 1}),
                            (c, b) -> if(c > 0, shiftleft(1L, b), 0L)),
                   0L, (a, v) -> a | v))
        """
    )
    return docs.select(F.col(id_col), sim.alias("simhash"))


def simhash_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_bits: int = 16,
    n_bits: int = 64,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """Docs sharing a simhash prefix bucket (near-dup candidates)."""
    sh = simhash(docs, id_col, text_col, n_bits=n_bits, word_hash=word_hash)
    n_bits = min(n_bits, 60) if word_hash == "portable" else n_bits
    bucket = F.shiftrightunsigned(F.col("simhash"), n_bits - prefix_bits)
    return sh.select(id_col, "simhash", bucket.alias("bucket"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
    n_bits: int = 64,
    word_hash: str = "xxhash64",
    bucket_cap: int = 2000,
) -> DataFrame:
    """VERIFIED SimHash near-dup pairs (id_a < id_b, hamming).

    Manku et al. (WWW'07) shape: the fingerprint splits into ``n_bands``
    bit-bands; docs sharing ANY band value become candidates — by
    pigeonhole, every pair within Hamming distance ``max_hamming <
    n_bands`` shares at least one intact band, so (hot-bucket cap aside)
    candidate recall over true pairs is exact, not probabilistic.
    Candidates are then verified JVM-side with ``bit_count(a ^ b) <=
    max_hamming``. The band self-join carries only (band_idx, band_val,
    id, simhash) — the 8-byte fingerprint IS the verification payload, so
    nothing document-sized rides the shuffle. Buckets above
    ``bucket_cap`` docs (degenerate boilerplate) are dropped via
    broadcast anti-join, same cap as the MinHash path.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands>{max_hamming} for "
            "exact candidate recall (pigeonhole)"
        )
    sh = simhash(docs, id_col, text_col, n_bits=n_bits, word_hash=word_hash)
    n_bits = min(n_bits, 60) if word_hash == "portable" else n_bits
    band_width = n_bits // n_bands
    mask = (1 << band_width) - 1
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * band_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.band_idx", "b.band_val")
    # the banded table feeds THREE branches (hot-bucket count + both join
    # sides) — without persisting it each branch would rescan the corpus
    # and recompute the per-doc fingerprint aggregate (the expensive
    # part); registered in the module cleanup registry like minhash
    banded = _persist(banded)
    hot = (
        banded.groupBy("band_idx", "band_val")
        .count()
        .where(F.col("count") > bucket_cap)
        .select("band_idx", "band_val")
    )
    banded = banded.join(F.broadcast(hot), ["band_idx", "band_val"], "left_anti")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sh_a"),
        "band_idx", "band_val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sh_b"),
        "band_idx", "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.expr("bit_count(_sh_a ^ _sh_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def repeated_ngram_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated-substring detection: the candidate-span
    step of exact substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    suffix-array ExactSubstr construction, re-expressed relationally
    over word k-grams). Returns one row per MAXIMAL span of consecutive
    k-gram positions whose k-grams each occur in ≥ ``min_docs`` distinct
    documents: (doc_id, span_start, span_end, span_tokens, n_hits),
    token indices inclusive. Within-doc repetition is a different
    signal (``textstats.repetition_stats``); this operator only flags
    text shared ACROSS documents (boilerplate, licenses, templates).

    Scale shape: one projection emits (doc, pos, gram); the repeated-
    gram set is a keyed count over (gram, doc) distinct pairs with
    map-side partial aggregation — never a self-join. The hits join is
    an equi-join on the gram key that AQE skew-splits when one
    boilerplate gram floods (hot-key note: at corpus scale swap the
    gram string for ``xxhash64(gram)`` — kept as the raw string here so
    DuckDB reproduces the pipeline exactly). The island merge is a
    per-document window (lag over pos), bounded by a single document's
    length.
    """
    from pyspark.sql.window import Window

    from nametag3_spark.operators.decontam import word_ngrams

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = docs.select(
        F.col(id_col),
        F.size(words).alias("_n_words"),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "ng"),
    )
    repeated = (
        grams.select("ng", id_col)
        .distinct()
        .groupBy("ng")
        .agg(F.count("*").alias("_n_docs"))
        .where(F.col("_n_docs") >= min_docs)
        .select("ng")
    )
    hits = grams.join(repeated, "ng").select(id_col, "pos", "_n_words")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = hits.withColumn(
        "_brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "_island",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            F.least(F.max("pos") + k - 1, F.max("_n_words") - 1)
            .cast("int")
            .alias("span_end"),
            F.count("*").cast("long").alias("n_hits"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("span_tokens"),
            "n_hits",
        )
    )


def ngram_jaccard_pairs(
    docs_a: DataFrame,
    docs_b: DataFrame,
    join_keys: list[str],
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Verified k-gram Jaccard for already-blocked pairs (equi-join on
    ``join_keys``)."""
    a = docs_a.withColumn("_sh_a", _word_shingles(text_col, k)).drop(text_col)
    b = docs_b.withColumn("_sh_b", _word_shingles(text_col, k)).drop(text_col)
    return a.join(b, join_keys).withColumn(
        "jaccard",
        F.when(
            F.size(F.array_union("_sh_a", "_sh_b")) > 0,
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        ).otherwise(F.lit(0.0)),
    )
