"""End-to-end web-scale KG construction (the north-rule pipeline):

  pages (url, warc_ts, html, text, lang)
    -> extract      text re-derived from html bytes (Arrow UDF; byte-identical
                    per url — the pinned invariant)
    -> mentions     vectorized mention detection, exploded per occurrence
    -> gazetteer    corpus-derived entity dictionary (salted counting)
    -> linked       broadcast entity linking
    -> canonical    MinHash-LSH blocking + Jaccard verify + connected
                    components -> canonical surface per entity
    -> triples      RML-style (subj, pred, obj, graph) quad table,
                    partitioned by graph, mention edges rewritten to
                    canonical entity IRIs

Every stage snapshots through CheckpointManager: a killed run resumes from
the last complete stage and produces the identical final triple set (tested
in tests/test_pipeline.py). Skew levers: salted surface counting, AQE
skew-join (session default), broadcast for every small side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canonicalize import canonical_entity_map
from .checkpoint import CheckpointManager
from .extract import extract_pages
from .mentions import build_gazetteer, link_mentions, page_mentions
from .pagedup import canonical_pages

PAGE_NS = "http://kg.example.com/page/"
ENTITY_NS = "http://kg.example.com/entity/"
ONTO = "http://kg.example.com/ontology#"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
XSD_STRING = "<http://www.w3.org/2001/XMLSchema#string>"
XSD_DATETIME = "<http://www.w3.org/2001/XMLSchema#dateTime>"

STAGES = (
    "extract",
    "pagedup",
    "mentions",
    "gazetteer",
    "linked",
    "canonical",
    "triples",
)


def _page_subj():
    return F.concat(F.lit("<"), F.col("url"), F.lit(">"))


def page_triples(pages_text: DataFrame) -> DataFrame:
    """Per-page triples: rdf:type, lang literal, warc_ts literal."""
    subj = _page_subj()
    t_type = pages_text.select(
        subj.alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.lit(f"<{ONTO}WebPage>").alias("obj"),
    )
    t_lang = pages_text.select(
        subj.alias("subj"),
        F.lit(f"<{ONTO}lang>").alias("pred"),
        F.concat(F.lit('"'), F.col("lang"), F.lit(f'"^^{XSD_STRING}')).alias("obj"),
    )
    t_ts = pages_text.select(
        subj.alias("subj"),
        F.lit(f"<{ONTO}crawledAt>").alias("pred"),
        F.concat(
            F.lit('"'),
            F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit(f'"^^{XSD_DATETIME}'),
        ).alias("obj"),
    )
    return t_type.unionByName(t_lang).unionByName(t_ts)


def mention_triples(linked: DataFrame, canonical: DataFrame) -> DataFrame:
    """Mention edges with objects rewritten to canonical entity IRIs.
    The canonical map is small (one row per gazetteer surface) -> broadcast."""
    rewritten = linked.join(F.broadcast(canonical), "surface").select(
        "url", F.col("canonical").alias("entity")
    )
    return rewritten.distinct().select(
        _page_subj().alias("subj"),
        F.lit(f"<{ONTO}mentions>").alias("pred"),
        F.concat(F.lit(f"<{ENTITY_NS}"), F.col("entity"), F.lit(">")).alias("obj"),
    )


def run_kg_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    stop_after: str | None = None,
    min_entity_pages: int = 3,
    jaccard_threshold: float = 0.6,
    python_parallelism: int | None = None,
) -> dict:
    """Run (or resume) the pipeline; returns the manifest's stage metrics.

    `stop_after` aborts after the named stage completes — the resume test
    uses it to simulate a mid-pipeline kill. `python_parallelism` caps the
    pandas-UDF stages' concurrent Python workers (see extract.extract_pages)."""
    cp = CheckpointManager(spark, workdir)

    def upto(stage: str) -> bool:
        return stop_after == stage

    pages_text = cp.run_stage(
        "extract", lambda: extract_pages(pages, python_parallelism)
    )
    if upto("extract"):
        return cp.stage_metrics()

    pages_text = cp.run_stage("pagedup", lambda: canonical_pages(pages_text))
    if upto("pagedup"):
        return cp.stage_metrics()

    mentions = cp.run_stage(
        "mentions", lambda: page_mentions(pages_text, python_parallelism)
    )
    if upto("mentions"):
        return cp.stage_metrics()

    gaz = cp.run_stage(
        "gazetteer", lambda: build_gazetteer(mentions, min_pages=min_entity_pages)
    )
    if upto("gazetteer"):
        return cp.stage_metrics()

    linked = cp.run_stage("linked", lambda: link_mentions(mentions, gaz))
    if upto("linked"):
        return cp.stage_metrics()

    canonical = cp.run_stage(
        "canonical",
        lambda: canonical_entity_map(
            gaz.select("surface"), threshold=jaccard_threshold
        ),
    )
    if upto("canonical"):
        return cp.stage_metrics()

    def build_triples() -> DataFrame:
        pt = page_triples(pages_text).withColumn("graph", F.lit("pages"))
        mt = mention_triples(linked, canonical).withColumn("graph", F.lit("mentions"))
        return pt.unionByName(mt)

    cp.run_stage("triples", build_triples)
    return cp.stage_metrics()


def load_triples(spark: SparkSession, workdir: str) -> DataFrame:
    return spark.read.parquet(f"{workdir}/stage_triples.parquet")
