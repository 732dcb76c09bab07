"""Mention detection + entity linking over extracted page text.

Per BASELINE.json input_hint these run as batched Arrow UDFs (no per-row
Python): mention detection is a vectorized pandas UDF producing the mention
list per page; linking is a broadcast join against the corpus-derived
gazetteer (small side), with the mention-count aggregation SALTED to survive
hub surfaces (a surface like 'spark' can appear on a large fraction of all
pages — a plain groupBy would put one key on one reducer)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

MIN_MENTION_LEN = 4
SALT_BUCKETS = 16

_WORD = re.compile(r"\S+")


@pandas_udf(ArrayType(StringType()))
def detect_mentions_udf(text: pd.Series) -> pd.Series:
    """Vectorized mention detector: tokens of length >= MIN_MENTION_LEN.
    (Swap in an NER model here at production; the Spark-side contract —
    batched Arrow in, array<string> out — stays identical.)"""
    return text.map(
        lambda t: [w for w in _WORD.findall(t or "") if len(w) >= MIN_MENTION_LEN]
    )


def page_mentions(
    pages_text: DataFrame, python_parallelism: int | None = None
) -> DataFrame:
    """(url, text) -> (url, surface) one row per mention occurrence.
    python_parallelism bounds this stage's Python workers (see
    extract.extract_pages)."""
    df = (
        pages_text.coalesce(python_parallelism)
        if python_parallelism
        else pages_text
    )
    return df.select(
        "url", F.explode(detect_mentions_udf(F.col("text"))).alias("surface")
    )


def salted_surface_counts(mentions: DataFrame) -> DataFrame:
    """Two-phase (salted) count of occurrences per surface.

    Phase 1 groups by (surface, salt) — hub surfaces fan out over
    SALT_BUCKETS reducers; phase 2 merges the per-salt partials. The salt is
    derived from url so it is deterministic."""
    salted = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(SALT_BUCKETS))
    )
    partial = salted.groupBy("surface", "salt").agg(
        F.count(F.lit(1)).alias("c"), F.approx_count_distinct("url").alias("u")
    )
    return partial.groupBy("surface").agg(
        F.sum("c").alias("n_occurrences"), F.sum("u").alias("n_pages_approx")
    )


def build_gazetteer(mentions: DataFrame, min_pages: int = 3) -> DataFrame:
    """Corpus-derived entity dictionary: surfaces on >= min_pages pages.
    Output: (surface, entity_id) with entity_id = the surface itself (the
    canonicalization stage collapses variant surfaces afterwards)."""
    counts = salted_surface_counts(mentions)
    # Lazily checkpointed: the gazetteer is threshold-filtered (small by
    # construction) but every downstream reference — the link join's
    # broadcast build AND the canonicalization surface set — would
    # otherwise re-execute the two-phase salted aggregation over the full
    # mention stream (measured ~0.6s per extra reference at 8k pages,
    # several references in the KG pipeline). eager=False: materialized
    # once on first use, no extra job.
    return (
        counts.filter(F.col("n_pages_approx") >= min_pages)
        .select(F.col("surface"), F.col("surface").alias("entity_id"))
        .localCheckpoint(eager=False)
    )


def link_mentions(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """(url, surface) x gazetteer -> (url, surface, entity_id).
    The gazetteer is orders of magnitude smaller than the mention stream —
    broadcast it so linking is map-side (no shuffle of the big side)."""
    return mentions.join(F.broadcast(gazetteer), "surface").select(
        "url", "surface", "entity_id"
    )
