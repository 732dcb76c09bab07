"""Entity canonicalization: MinHash-LSH blocking over surface char-n-grams
generates candidate duplicate pairs, exact Jaccard verifies them, and
connected components collapses the verified pairs into canonical entities.

Scale shape: candidate generation is linear in #surfaces x #bands (never
all-pairs); verification touches only candidates; CC runs on the (tiny
relative to pages) entity-pair edge list with per-round checkpointing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.cc import connected_components

N_HASHES = 8
BAND_ROWS = 2
NGRAM = 3


def _char_ngrams(col, n: int = NGRAM):
    """Distinct character n-grams of a surface string."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(col, i, n)))


def surface_candidate_pairs(surfaces: DataFrame, col: str = "surface") -> DataFrame:
    """(surface) -> candidate pairs (a, b) with a < b via MinHash banding
    over char n-grams."""
    grams = surfaces.select(
        F.col(col).alias("s"), F.explode(_char_ngrams(F.col(col))).alias("g")
    )
    from ..textops.dedup import minhash64

    sig = grams.groupBy("s").agg(
        *[F.min(minhash64(F.col("g"), i)).alias(f"h{i}") for i in range(N_HASHES)]
    )
    bands = sig.select(
        "s",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[F.col(f"h{b * BAND_ROWS + r}") for r in range(BAND_ROWS)],
                            )
                        ).alias("key"),
                    )
                    for b in range(N_HASHES // BAND_ROWS)
                ]
            )
        ).alias("bk"),
    ).select("s", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .distinct()
    )


def verified_pairs(candidates: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Exact char-n-gram Jaccard on candidates only."""
    jac = F.size(F.array_intersect(F.col("ga"), F.col("gb"))) / F.size(
        F.array_union(F.col("ga"), F.col("gb"))
    )
    return (
        candidates.withColumn("ga", _char_ngrams(F.col("a")))
        .withColumn("gb", _char_ngrams(F.col("b")))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b")
    )


def canonical_entity_map(surfaces: DataFrame, threshold: float = 0.6) -> DataFrame:
    """(surface) -> (surface, canonical) where canonical = min surface of the
    duplicate cluster (connected component); singletons map to themselves."""
    cands = surface_candidate_pairs(surfaces)
    edges = verified_pairs(cands, threshold).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    comp = connected_components(edges)  # (node, component)
    return (
        surfaces.select(F.col("surface"))
        .distinct()
        .join(comp, F.col("surface") == F.col("node"), "left")
        .select(
            "surface",
            F.coalesce(F.col("component"), F.col("surface")).alias("canonical"),
        )
    )
