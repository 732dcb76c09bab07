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

from ..graph.cc import connected_components
from ..textops.common import ngrams_col
from ..textops.dedup import minhash_lsh_pairs, normalized_fingerprint

MAX_BUCKET = 50  # LSH band buckets bigger than this are non-discriminative
MIN_BANDS = 2  # near-dup candidates must collide in >= 2 of 4 bands
NEAR_DUP_JACCARD = 0.5  # exact-verify bar: candidates below this are dropped


def duplicate_edges(pages_text: DataFrame) -> DataFrame:
    """(src, dst) url pairs that are exact or near duplicates."""
    fp = pages_text.select(
        "url", normalized_fingerprint(F.col("text")).alias("fp")
    )
    canon = fp.groupBy("fp").agg(F.min("url").alias("dst"), F.count(F.lit(1)).alias("n"))
    exact = (
        fp.join(canon.filter(F.col("n") > 1), "fp")
        .filter(F.col("url") != F.col("dst"))
        .select(F.col("url").alias("src"), F.col("dst"))
    )
    cands = (
        minhash_lsh_pairs(
            pages_text, id_col="url", text_col="text", max_bucket=MAX_BUCKET
        )
        .filter(F.col("n_bands") >= MIN_BANDS)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
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
    grams = pages_text.select(
        "url", F.explode(ngrams_col(F.col("text"))).alias("ng")
    )
    sizes = grams.groupBy("url").agg(F.count(F.lit(1)).alias("n"))
    # candidate pairs and the per-page size table are small relative to the
    # corpus BY CONSTRUCTION (LSH bucket cap + band threshold), so broadcast
    # THEM — and only them. Broadcasting the cands⋈src_grams result would
    # ship pairs × grams-per-page (hundreds of MB on a big corpus); instead
    # cands broadcasts into the src-gram join (probed in place), and the
    # (dst, ng) join stays a shuffled hash join on gram rows.
    src_g = grams.select(F.col("url").alias("src"), "ng")
    dst_g = grams.select(F.col("url").alias("dst"), "ng")
    inter = (
        F.broadcast(cands)
        .join(src_g, "src")
        .join(dst_g, ["dst", "ng"])
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
    (the min url) per cluster. Output schema == input schema."""
    comp = connected_components(duplicate_edges(pages_text))
    return (
        pages_text.join(comp, pages_text["url"] == comp["node"], "left")
        .filter(F.col("component").isNull() | (F.col("component") == F.col("url")))
        .select(*pages_text.columns)
    )
