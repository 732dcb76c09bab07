"""Deduplication operators for web-scale training-data pipelines.

Four tiers, all shuffle-aware and expressed as DataFrame ops (no Python in
the hot path); each has a DuckDB oracle twin in oracles.py:

  exact_dedup         hash-groupBy on a normalized-text md5 fingerprint
  ngram_jaccard_pairs exact n-gram Jaccard all-pairs (inverted-index join —
                      the standard prefix-filter-free similarity join)
  minhash_lsh_pairs   MinHash signatures + LSH banding join (the scale path:
                      candidate generation cost ~ #docs x #bands, not #pairs)
  simhash             per-doc SimHash bit signature for Hamming-style near-dup

At 100 TB: all joins key on content-derived hashes -> uniformly distributed,
no skew salting needed; the banding join groups by (band_id, band_key) so
each bucket is small by construction. Empty-text docs produce no shingles and
silently drop out of pair generation (they are caught by exact_dedup instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import pos_grams, words_col

# ---------------------------------------------------------------------------


def normalized_fingerprint(text_col):
    """md5 of lowercased, whitespace-collapsed text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (fingerprint, canonical_id =
    lowest doc id, dup_count). Map-side-combinable single shuffle."""
    return (
        docs.select(
            normalized_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------

INCREMENTAL_BATCH_BUCKET = 90  # buckets >= this play the newly-arrived batch


def incremental_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Ingest-time dedup of a NEW BATCH against an EXISTING CORPUS — the
    incremental face of exact_dedup (a crawl pipeline never re-dedups the
    whole corpus; each arriving batch is checked against what is already
    stored). Here the batch is simulated deterministically as the docs whose
    content-stable split bucket (quality.split_bucket, the train/test
    machinery) is >= INCREMENTAL_BATCH_BUCKET; everything below is corpus.

    Plan: one scan computes (fingerprint, id, bucket); the corpus side
    collapses to a distinct-fingerprint hash agg, the batch side to a
    min-id/count hash agg, and a LEFT ANTI join on fingerprint keeps only
    genuinely-new content. At 100 TB the corpus fingerprint set dominates:
    the anti join shuffles on a content-derived md5 key (uniform, no skew
    salting needed) and both sides take map-side partial aggregation; in
    production the corpus side is a pre-bucketed fingerprint table so only
    the (small) batch shuffles. Output: one row per new fingerprint —
    (fingerprint, new_id = lowest batch doc id, batch_dups)."""
    from .quality import split_bucket

    tagged = docs.select(
        normalized_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.col(id_col),
        split_bucket(F.col(id_col)).alias("__bucket"),
    )
    corpus = (
        tagged.filter(F.col("__bucket") < INCREMENTAL_BATCH_BUCKET)
        .select("fingerprint")
        .distinct()
    )
    batch = (
        tagged.filter(F.col("__bucket") >= INCREMENTAL_BATCH_BUCKET)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("new_id"),
            F.count(F.lit(1)).alias("batch_dups"),
        )
    )
    return batch.join(corpus, "fingerprint", "left_anti")


# ---------------------------------------------------------------------------


def _doc_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # words materialized at a projection boundary before the gram transform:
    # CSE does not reach inside the pos_grams lambda, so grams built directly
    # over words_col(text) re-tokenize once per element_at (n per gram) — the
    # same fix as winnow_fingerprints/decontaminate, kept by CollapseProject
    # because the word array is multiply referenced.
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        words_col(F.col(text_col)).alias("_ws"),
    )
    return staged.select(
        "doc_id",
        F.explode(F.array_distinct(pos_grams(F.col("_ws"), n))).alias("ng"),
    )


NGRAM_MAX_DF = 50  # drop n-grams present in more docs than this before the self-join


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = NGRAM_MAX_DF,
) -> DataFrame:
    """All pairs (id_a < id_b) with word-n-gram Jaccard >= threshold, computed
    over *discriminative* n-grams only: grams whose document frequency exceeds
    max_df (boilerplate — "click here to subscribe") are dropped before the
    self-join, from intersections AND set sizes, so the score stays a true
    Jaccard over the filtered gram sets.

    Why the cap is load-bearing at scale: the inverted-index join costs
    sum over grams of df(gram)^2 — one hot shingle makes it a cartesian on
    that key. With df <= max_df the cost is bounded by max_df * |gram rows|,
    i.e. linear in corpus size. (Measured here: sf0.1 went 198.8s -> seconds.)
    The df guard is one window over the gram shuffle key, and the self-join
    reuses that exchange. Set max_df=None for the exact-all-grams variant
    (only sane as a post-LSH verifier on candidate pairs, never corpus-wide)."""
    grams = _doc_ngrams(docs, id_col, text_col, n)
    if max_df is not None:
        # The df guard is a count() window over the gram shuffle key ON
        # PURPOSE — measured against a hash-agg + broadcast-anti-join
        # variant (20.2s vs 50.1s at sf0.1): the self-join below is a
        # sort-merge join on the very same ng key, so the window's
        # exchange+sort is reused by BOTH join inputs and costs nothing
        # extra, while the anti-join variant re-tokenizes the corpus for
        # the hot-gram aggregate and then sorts both join sides anyway.
        # (minhash_lsh_pairs uses the anti-join shape instead because its
        # signature aggregate is shared via AQE stage reuse.)
        from pyspark.sql.window import Window

        w = Window.partitionBy("ng")
        grams = (
            grams.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))

    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.ng") == F.col("b.ng")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------

N_HASHES = 8
BAND_ROWS = 2  # 4 bands of 2 rows
MINHASH_MAX_BUCKET = 50  # default LSH bucket skew cap (see minhash_lsh_pairs)


def minhash64(col, seed: int | str):
    """Portable 60-bit hash: the first 15 hex chars of md5 as a BIGINT.
    Identical in DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT.

    Numeric on purpose: min(string) has a variable-length aggregation buffer
    which forces Spark out of the hash-aggregate fast path into sort-based
    aggregation (measured 20x slower on the signature build); min(long)
    stays in the UnsafeRow hash map."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col)), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, h0..h{N_HASHES-1}) MinHash signature; hash family i is the
    numeric md5-prefix hash of (i || '|' || shingle)."""
    grams = _doc_ngrams(docs, id_col, text_col, n)
    # project the hash columns BEFORE the aggregate: keeps the generator
    # stage and the partial aggregation in separate codegen shapes (measured
    # 2x faster than evaluating the hash chain inside the agg)
    proj = grams.select(
        "doc_id", *[minhash64(F.col("ng"), i).alias(f"x{i}") for i in range(N_HASHES)]
    )
    return proj.groupBy("doc_id").agg(
        *[F.min(f"x{i}").alias(f"h{i}") for i in range(N_HASHES)]
    )


def _band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH banding rows of a signature table: band key =
    md5 of that band's BAND_ROWS signature columns. The single banding
    builder — the self-join (minhash_lsh_pairs) and the batch-vs-corpus
    incremental variant share it."""
    n_bands = N_HASHES // BAND_ROWS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"h{b * BAND_ROWS + r}")
                                    for r in range(BAND_ROWS)
                                ],
                            )
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = MINHASH_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_bands they collide in).

    Banding: N_HASHES/BAND_ROWS bands, band key = md5 of its rows; docs
    sharing any band key become candidates.

    max_bucket is the skew guard for web-scale corpora, ON by default: a
    band bucket with thousands of members is non-discriminative (boilerplate,
    near-empty pages) and would make the self-join quadratic on that key —
    standard LSH practice drops buckets above a size cap before joining.
    max_bucket=None opts into the uncapped all-candidates variant (only sane
    on corpora known to be free of hot buckets)."""
    sig = minhash_signatures(docs, n, id_col, text_col)
    bands = _band_rows(sig)

    if max_bucket:
        # same anti-join shape as the ngram df cap: oversized buckets are
        # the rare non-discriminative tail, so count them (hash agg with
        # map-side partials; the signature-build exchange below is shared
        # with the probe side via AQE stage reuse) and broadcast-anti the
        # band rows against that tiny hot set — no window sort over the
        # full banding table
        hot = (
            bands.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket)
            .select("band", "key")
        )
        bands = bands.join(F.broadcast(hot), ["band", "key"], "left_anti")

    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) — SIMHASH_BITS-char '0'/'1' string.

    Bit j is the sign of sum over tokens of +-1 by the high bit of md5
    nibble j (nibble in 89abcdef => +1). Token multiset, not set: repeated
    words weigh more, like classic SimHash term weighting."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words_col(F.col(text_col))).alias("w"),
    ).select("doc_id", F.md5("w").alias("h"))
    aggs = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    summed = toks.groupBy("doc_id").agg(*aggs)
    bits = F.concat(
        *[F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(SIMHASH_BITS)]
    )
    return summed.select("doc_id", bits.alias("simhash"))

# ---------------------------------------------------------------------------

DECON_NGRAM = 8  # word n-gram width for train-vs-eval overlap (GPT-3 used 13)


def decontaminate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Training-data decontamination: which TRAIN documents share a word
    DECON_NGRAM-gram with any EVAL (held-out test split) document, and how
    many distinct eval grams each shares. Output: (doc_id, n_shared_grams),
    contaminated train docs only.

    The eval set is the 'test' slice of the content-stable hash split
    (quality.split_bucket, same seed as doc_train_test_split), so the op
    composes with the split it is meant to protect. Both sides reduce grams
    to the md5-prefix BIGINT (the portable 64-bit hash used throughout):
    at 10^12 docs the benchmark/eval side is a few thousand documents, so
    its distinct gram-hash set is kilobytes-to-megabytes -> broadcast into a
    map-side semi join; only contaminated (doc, gram) survivors reach the
    per-doc count, which is a plain map-side-combinable hash aggregate.
    NULL text coalesces to '' (zero grams) like the repetition/clean ops."""
    from .quality import SPLIT_BOUNDS, split_bucket

    # PROJECTION BOUNDARY (same reason as quality.winnow_fingerprints): CSE
    # does not reach inside the pos_grams transform lambda, so building the
    # 8-gram directly over words_col(text) re-evaluates split+filter once per
    # element_at — ~8 x n_grams tokenizations per doc (measured 33s -> 3s at
    # sf0.1). Materializing the word array as a column makes it one pass;
    # CollapseProject keeps the boundary because `_ws` is multiply referenced.
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        split_bucket(F.col(id_col)).alias("_b"),
        words_col(F.coalesce(F.col(text_col), F.lit(""))).alias("_ws"),
    )
    grams = staged.select(
        "doc_id",
        "_b",
        F.explode(F.array_distinct(pos_grams(F.col("_ws"), DECON_NGRAM))).alias(
            "gram"
        ),
    ).select(
        "doc_id",
        "_b",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long").alias("gh"),
    )
    eval_grams = (
        grams.filter(F.col("_b") >= SPLIT_BOUNDS[1]).select("gh").distinct()
    )
    train_grams = grams.filter(F.col("_b") < SPLIT_BOUNDS[0]).select("doc_id", "gh")
    return (
        train_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# --- C4-style duplicated-span removal ---------------------------------------

# C4's rule: of any three-sentence span occurring more than once in the
# corpus, keep the FIRST occurrence and cut the rest from their documents.
# This corpus has no sentence delimiters, so the span unit is a fixed
# SPAN_WORDS-word non-overlapping block (the last block of a doc may be
# shorter). "First occurrence" = minimum (doc_id, pos), bit-packed as
# doc_id * SPAN_POS_PACK + pos so the argmin stays a primitive min() in
# whole-stage HashAggregate (the min_by-declarative-aggregate lesson:
# struct buffers fall to SortAggregate).
SPAN_WORDS = 3
SPAN_POS_PACK = 1 << 20  # pos < 1M blocks/doc; ~3M-word docs — far above any
# web page; a corpus with longer docs raises the pack width with the id range


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SPAN_WORDS,
) -> DataFrame:
    """(doc_id, clean_text, n_spans_dropped) — cross-corpus duplicated-span
    removal: every n-word block that appears anywhere else in the corpus is
    cut except its first occurrence, and each document is reassembled from
    its surviving blocks in order.

    100 TB shape: blocks are built per-row in codegen (staged word array ->
    slice/concat_ws -> posexplode, zero shuffle); the occurrence stats are
    ONE map-side-combinable hash agg keyed by the block string (content-
    derived -> uniform, no salt); the stats join back keys on the same
    block column so AQE reuses the exchange; reassembly is one hash agg on
    doc_id with a pos-sorted fold (bounded by a single document's length).
    A boilerplate block repeated billions of times is ONE stats row, and
    its group in the stats agg is map-side-combined — the skew lives in the
    pre-agg explode, which is embarrassingly parallel."""
    wc = words_col(F.coalesce(F.col(text_col), F.lit("")))
    staged = docs.select(F.col(id_col).alias("doc_id"), wc.alias("_w"))
    m = F.size("_w")
    n_blocks = F.ceil(m / F.lit(n)).cast("int")
    blocks_arr = F.when(m > 0, F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.concat_ws(" ", F.slice("_w", i * n + 1, n)),
    )).otherwise(F.array().cast("array<string>"))
    per_doc = staged.select("doc_id", blocks_arr.alias("_blocks"))
    spans = per_doc.select(
        "doc_id", F.posexplode("_blocks").alias("pos", "block")
    )
    stats = spans.groupBy("block").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.col("doc_id") * SPAN_POS_PACK + F.col("pos")).alias("fk"),
    )
    kept = spans.join(stats, "block").filter(
        (F.col("cnt") == 1)
        | (F.col("doc_id") * SPAN_POS_PACK + F.col("pos") == F.col("fk"))
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "block"))),
                lambda x: x["block"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        per_doc.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.size("_blocks") - F.coalesce("n_kept", F.lit(0))).cast("long")
            .alias("n_spans_dropped"),
        )
    )


def incremental_minhash_neardup(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = MINHASH_MAX_BUCKET,
) -> DataFrame:
    """NEAR-dup candidates of a NEW BATCH against an EXISTING CORPUS — the
    incremental face of minhash_lsh_pairs, completing the pair with
    incremental_exact_dedup (a crawl increment is checked for near-dups
    against what is already stored; the corpus is never re-self-joined).
    Batch/corpus split is the same content-stable hash bucket as the exact
    variant (quality.split_bucket >= INCREMENTAL_BATCH_BUCKET = batch).

    Plan: ONE scan builds signatures for both sides (the bucket is a pure
    function of the id, recomputed after the signature agg rather than
    dragged through it); banding is the shared _band_rows builder. The hot-
    bucket cap applies to the CORPUS side only — that is the side whose
    boilerplate buckets grow with the archive; the batch side is one
    increment and joins as the (smaller) probe. The batch x corpus band join
    is a plain equi-join on (band, key) — NOT a self-join, so cost scales
    with batch size x bucket occupancy, not corpus^2; in production the
    corpus banding table is a persisted, bucketed-by-key artifact appended
    per increment, so only the batch side is ever rebuilt.

    Output: (new_id, corpus_id, n_bands) — batch docs likely-near-duplicate
    of an archived doc, with LSH evidence strength."""
    from .quality import split_bucket

    sig = minhash_signatures(docs, n, id_col, text_col)
    bands = _band_rows(sig).withColumn("__bucket", split_bucket(F.col("doc_id")))
    corp = bands.filter(F.col("__bucket") < INCREMENTAL_BATCH_BUCKET).drop("__bucket")
    batch = bands.filter(F.col("__bucket") >= INCREMENTAL_BATCH_BUCKET).drop(
        "__bucket"
    )
    if max_bucket:
        hot = (
            corp.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket)
            .select("band", "key")
        )
        corp = corp.join(F.broadcast(hot), ["band", "key"], "left_anti")
    return (
        batch.alias("b")
        .join(
            corp.alias("c"),
            (F.col("b.band") == F.col("c.band")) & (F.col("b.key") == F.col("c.key")),
        )
        .groupBy(
            F.col("b.doc_id").alias("new_id"), F.col("c.doc_id").alias("corpus_id")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
