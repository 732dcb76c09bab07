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
# Short surfaces (4-6 chars) have only a handful of char n-grams, so many
# distinct surfaces share identical MinHash bands — without a bucket cap the
# banding self-join is quadratic on those buckets (observed as a runaway
# single-task ArrayDistinct stage in the KG bench). Oversized buckets are
# non-discriminative anyway; dropping them loses only low-signal candidates.
MAX_BUCKET = 50
MIN_BANDS = 2  # candidates must collide in >= 2 of 4 bands
CANON_JACCARD = 0.6  # exact-Jaccard verification threshold (oracle twin imports it)


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
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "key")
    bands = (
        bands.withColumn("__bn", F.count(F.lit(1)).over(w))
        .filter(F.col("__bn") <= MAX_BUCKET)
        .drop("__bn")
    )
    a, b = bands.alias("a"), bands.alias("b")
    # require agreement in >= MIN_BANDS of the 4 bands: single-band
    # collisions on few-gram surfaces are near-random and would flood the
    # verifier (8000-page probe: 186k single-band pairs -> 26k at >=2)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= MIN_BANDS)
        .select("a", "b")
    )


def verified_pairs(candidates: DataFrame, threshold: float = CANON_JACCARD) -> DataFrame:
    """Exact char-n-gram Jaccard on candidates only. The gram array is
    computed ONCE per surface and joined in (broadcast — the surface set is
    the gazetteer, small by construction), not recomputed per pair row."""
    surfaces = (
        candidates.select(F.col("a").alias("s"))
        .unionByName(candidates.select(F.col("b").alias("s")))
        .distinct()
        .select("s", _char_ngrams(F.col("s")).alias("g"))
    )
    jac = F.size(F.array_intersect(F.col("ga"), F.col("gb"))) / F.size(
        F.array_union(F.col("ga"), F.col("gb"))
    )
    return (
        candidates.join(
            F.broadcast(surfaces.select(F.col("s").alias("a"), F.col("g").alias("ga"))),
            "a",
        )
        .join(
            F.broadcast(surfaces.select(F.col("s").alias("b"), F.col("g").alias("gb"))),
            "b",
        )
        .filter(jac >= threshold)
        .select("a", "b")
    )


def canonical_entity_map(surfaces: DataFrame, threshold: float = CANON_JACCARD) -> DataFrame:
    """(surface) -> (surface, canonical) where canonical = min surface of the
    duplicate cluster (connected component); singletons map to themselves.

    Both intermediates here are multiply referenced and gazetteer-BOUNDED,
    so they are lazily localCheckpointed (the pagedup.duplicate_edges
    lesson, measured there as 202s -> 20s): `surfaces` feeds the gram
    explode AND the final distinct join — without the checkpoint a caller
    passing a derived plan (kg_job passes the salted gazetteer aggregate)
    re-executes that whole upstream DAG once per reference; `cands` is
    referenced three times inside verified_pairs (two semi-side distincts +
    the pair join), which otherwise re-runs the LSH banding self-join
    three times. Lazy (eager=False) so each materializes at most once, on
    first use, and never adds a separate job."""
    surfaces = surfaces.localCheckpoint(eager=False)
    cands = surface_candidate_pairs(surfaces).localCheckpoint(eager=False)
    edges = verified_pairs(cands, threshold).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    # string-keyed CC on purpose: the node set here is the verified-pair
    # surfaces — bounded by the GAZETTEER (min-page-count entities), not the
    # corpus — so the dictionary-encoding pass that pays off on corpus-sized
    # page graphs (connected_components_encoded, used by pipeline/pagedup)
    # would cost more stages than its cheaper shuffles save
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


CANON_PLURAL_MOD = 3  # ~1/3 of surfaces get a deterministic plural twin


def entity_canonical_query(spark, sf_dir: str) -> DataFrame:
    """Driver-contract face of the canonicalization stage: (surface,
    canonical) over the corpus's mention-eligible vocabulary, with
    deterministic plural twins ('w' -> 'ws' for surfaces whose content hash
    % CANON_PLURAL_MOD == 0) planted so the LSH -> >=2-band -> exact-Jaccard
    -> CC path has real merges to find — the pagedup-tier pattern
    (page_canonical_lsh) applied to ENTITY surfaces. LSH recall < 1 is fine:
    the DuckDB oracle replays the identical banding/cap/verify pipeline and
    closes components with a recursive min-label CTE, so both engines miss
    the same pairs.

    Scale shape: unchanged from canonical_entity_map — banding linear in
    surfaces x bands with the MAX_BUCKET cap, verification only on >=2-band
    candidates with ONE gram array per surface (broadcast), CC on the
    verified-pair edge list (gazetteer-bounded, so string keys beat the
    dictionary-encoding pass that pays off on corpus-sized page graphs)."""
    from pyspark.sql import functions as F

    from ..kgops import eligible_tokens
    from ..textops.dedup import minhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = eligible_tokens(docs, "w").select("w").distinct()
    variants = words.filter(
        minhash64(F.col("w"), "plural") % CANON_PLURAL_MOD == 0
    ).select(F.concat(F.col("w"), F.lit("s")).alias("w"))
    surfaces = (
        words.unionByName(variants).distinct().select(F.col("w").alias("surface"))
    )
    return canonical_entity_map(surfaces)
