"""Page-level deduplication: exact (fingerprint hash-groupBy) + near-dup
(MinHash-LSH banding with a bucket-size skew cap) edges, collapsed with
connected components; only the canonical page of each duplicate cluster
survives into mention detection and triple materialisation.

This is the classic Common-Crawl hygiene stage: ~several percent of pages
are boilerplate duplicates; dropping them BEFORE the Python mention stage
also cuts the most expensive part of the pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.cc import connected_components_encoded
from ..textops.common import pos_grams, words_col
from ..textops.dedup import minhash_lsh_pairs, normalized_fingerprint

MAX_BUCKET = 50  # LSH band buckets bigger than this are non-discriminative
MIN_BANDS = 2  # near-dup candidates must collide in >= 2 of 4 bands
NEAR_DUP_JACCARD = 0.5  # exact-verify bar: candidates below this are dropped


def duplicate_edges(pages_text: DataFrame) -> DataFrame:
    """(src, dst) url pairs that are exact or near duplicates."""
    exact = exact_duplicate_edges(pages_text)
    cands = (
        minhash_lsh_pairs(
            pages_text, id_col="url", text_col="text", max_bucket=MAX_BUCKET
        )
        .filter(F.col("n_bands") >= MIN_BANDS)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        # materialized ONCE: the pair table is referenced three times below
        # (two semi-join builds + the probe broadcast), and each reference
        # would otherwise re-execute the whole LSH candidate DAG (signature
        # aggregate + banding self-join) — measured 202s -> ~20s at 8k
        # pages. The table is small by construction (bucket cap + band
        # threshold), so localCheckpoint keeps it distributed but cuts the
        # lineage.
        .localCheckpoint(eager=True)
    )
    # Exact-Jaccard verification before CC (mirrors canonicalize.verified_pairs'
    # intent): a false-positive band collision would otherwise permanently and
    # silently drop a distinct page from the corpus. Implementation is the
    # inverted-index shape — explode grams, count per-pair intersections with
    # hash joins/aggs, derive the union from per-page set sizes — NOT
    # per-pair array_intersect/array_union columns: those allocate a hash set
    # per evaluated pair inside the join condition, which serializes into
    # whatever single task AQE coalesces the tiny pair table into (observed:
    # a 14-minute one-task stage). Everything below is hash-partitioned and
    # linear in #candidate-pair grams.
    # words staged at a projection boundary before the gram transform: CSE
    # does not reach inside the pos_grams lambda, so grams built directly
    # over words_col(text) re-tokenize once per element_at (see
    # textops/dedup._doc_ngrams — same fix, measured ~5x on the gram stage).
    grams = pages_text.select(
        "url", words_col(F.col("text")).alias("_ws")
    ).select(
        "url",
        F.explode(F.array_distinct(pos_grams(F.col("_ws"), 3))).alias("ng"),
    )
    sizes = grams.groupBy("url").agg(F.count(F.lit(1)).alias("n"))
    # Candidate pairs and the per-page size table are small relative to the
    # corpus BY CONSTRUCTION (LSH bucket cap + band threshold), so broadcast
    # THEM — and only them. Broadcasting the cands⋈src_grams result would
    # ship pairs × grams-per-page (hundreds of MB on a big corpus). Shape:
    #   1. semi-join each gram side down to candidate pages via the
    #      broadcast pair table (probed in place — the corpus-sized gram
    #      tables are never shuffled);
    #   2. equi-join the two REDUCED gram sides, sized by candidate pages
    #      only, as a shuffle-hash join — hinted, because the planner's SMJ
    #      default would re-sort the gram rows (the allocation-heavy sort is
    #      the measured anti-pattern on skewed string keys; BENCH.md).
    src_g = grams.select(F.col("url").alias("src"), "ng").join(
        F.broadcast(cands.select("src").distinct()), "src", "leftsemi"
    )
    dst_g = grams.select(F.col("url").alias("dst"), "ng").join(
        F.broadcast(cands.select("dst").distinct()), "dst", "leftsemi"
    )
    inter = (
        F.broadcast(cands)
        .join(src_g, "src")
        .join(dst_g.hint("shuffle_hash"), ["dst", "ng"])
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    near = (
        inter.join(
            F.broadcast(sizes.select(F.col("url").alias("src"), F.col("n").alias("na"))),
            "src",
        )
        .join(
            F.broadcast(sizes.select(F.col("url").alias("dst"), F.col("n").alias("nb"))),
            "dst",
        )
        .filter(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            >= NEAR_DUP_JACCARD
        )
        .select("src", "dst")
    )
    return exact.unionByName(near)


def canonical_pages(pages_text: DataFrame) -> DataFrame:
    """Drop non-canonical duplicates: CC over duplicate edges, keep one page
    (the min url) per cluster. Output schema == input schema. CC runs
    DICTIONARY-ENCODED (graph/cc.py): the loop re-shuffles the edge set
    every round, and dense long keys are several times cheaper to shuffle
    than urls — the 10^12-node production shape; min-url labels survive the
    encoding because the ids are order-preserving."""
    return _keep_canonical(
        pages_text, connected_components_encoded(duplicate_edges(pages_text))
    )


def exact_duplicate_edges(pages_text: DataFrame) -> DataFrame:
    """(src, dst) pairs from EXACT fingerprint duplicates only — the
    deterministic subset of duplicate_edges, used by the driver-contract
    query below (near-dup LSH edges have no clean SQL oracle; the exact tier
    exercises the same CC + canonical-selection path end-to-end)."""
    fp = pages_text.select("url", normalized_fingerprint(F.col("text")).alias("fp"))
    canon = fp.groupBy("fp").agg(
        F.min("url").alias("dst"), F.count(F.lit(1)).alias("n")
    )
    return (
        fp.join(canon.filter(F.col("n") > 1), "fp")
        .filter(F.col("url") != F.col("dst"))
        .select(F.col("url").alias("src"), F.col("dst"))
    )


def canonical_pages_exact(pages_text: DataFrame) -> DataFrame:
    """canonical_pages restricted to exact-duplicate edges: runs the REAL
    iterative large-star/small-star CC (graph/cc.py) over the exact edge
    set, then keeps one page per component. Because the component id is the
    min url of each fingerprint group, the result has a closed-form DuckDB
    oracle (url = min(url) over fingerprint) — this is what promotes the CC
    tier into the driver's CORRECTNESS gate. Runs the dictionary-encoded CC
    (see canonical_pages)."""
    return _keep_canonical(
        pages_text, connected_components_encoded(exact_duplicate_edges(pages_text))
    )


def page_canonical_exact_query(spark, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper for the CC tier. The documents table has no
    exact duplicates, so the query deterministically plants them — every 7th
    doc gets a second url with identical text — then runs the full
    exact-edges -> connected-components -> keep-canonical path and returns
    the surviving urls. Oracle: url = min(url) per text fingerprint."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def pages(tag: str, flt=None):
        d = docs.filter(flt) if flt is not None else docs
        return d.select(
            F.concat(F.lit(tag), F.col("doc_id").cast("string")).alias("url"),
            "text",
        )

    all_pages = pages("u").unionByName(pages("d", (F.col("doc_id") % 7) == 0))
    return canonical_pages_exact(all_pages).select("url")


def page_canonical_lsh_query(spark, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper for the NEAR-DUP tier — the full
    duplicate_edges path that page_canonical_exact cannot reach: capped
    MinHash-LSH banding, >=2-band agreement, inverted-index exact-Jaccard
    verification, then real iterative CC. The corpus has no near-duplicates,
    so the query plants them deterministically: every 11th doc gets a twin
    with the first word substituted (word-level trigrams lose only the one
    leading gram, so the planted Jaccard is (w-3)/(w-1) — far above the 0.5
    bar at any doc length >= the corpus minimum). The oracle replays the
    identical LSH pipeline in SQL (same md5 hash family, banding, bucket
    cap, band threshold, Jaccard verify) and closes the components with a
    recursive min-label reachability CTE — so every planted OR incidental
    collision resolves identically on both engines."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orig = docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"), "text"
    )
    twin = docs.filter((F.col("doc_id") % 11) == 0).select(
        F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("url"),
        F.regexp_replace("text", r"^\S+", "xsubx").alias("text"),
    )
    return canonical_pages(orig.unionByName(twin)).select("url")


def _keep_canonical(pages_text: DataFrame, comp: DataFrame) -> DataFrame:
    return (
        pages_text.join(comp, pages_text["url"] == comp["node"], "left")
        .filter(F.col("component").isNull() | (F.col("component") == F.col("url")))
        .select(*pages_text.columns)
    )
