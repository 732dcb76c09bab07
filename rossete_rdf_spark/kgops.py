"""KG-construction ops over the `documents` table (the driver-checkable,
batch face of the web-pipeline stages in pipeline/):

  kg_mentions     mention detection (term extraction) over text
  kg_entity_link  dictionary-based entity linking (corpus-derived gazetteer)
  kg_doc_triples  RML-style triple materialisation for documents

These are the same shapes the web pipeline runs over (url, warc_ts, html,
text, lang) pages; here they run over the synthetic documents table so the
driver can oracle-check them in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops.common import words_col

MIN_MENTION_LEN = 4
MIN_ENTITY_DOCS = 20  # a term is an "entity" if it appears in >= N distinct docs
ENTITY_NS = "http://kg.example.com/entity/"
DOC_NS = "http://kg.example.com/doc/"
ONTO = "http://kg.example.com/ontology#"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def mentions_from(docs: DataFrame) -> DataFrame:
    """(doc_id, mention, n_occurrences) — tokens of length >= MIN_MENTION_LEN.
    Explode + count: one shuffle keyed by (doc_id, mention)."""
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("mention")
    ).filter(F.length("mention") >= MIN_MENTION_LEN)
    return toks.groupBy("doc_id", "mention").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mentions_from(_docs(spark, sf_dir))


def entity_dictionary(docs: DataFrame) -> DataFrame:
    """Corpus-derived gazetteer: (entity=mention term, n_docs). At web scale
    the dictionary side is small -> broadcast into the link join."""
    m = mentions_from(docs)
    return (
        m.groupBy("mention")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= MIN_ENTITY_DOCS)
        .select(F.col("mention").alias("entity"), "n_docs")
    )


def kg_entity_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mention, entity_iri, n_occurrences) — mention rows whose term
    is in the corpus gazetteer; the dictionary is broadcast."""
    docs = _docs(spark, sf_dir)
    m = mentions_from(docs)
    d = entity_dictionary(docs)
    return (
        m.join(F.broadcast(d), m["mention"] == d["entity"])
        .select(
            "doc_id",
            "mention",
            F.concat(F.lit(ENTITY_NS), F.col("mention")).alias("entity_iri"),
            "n_occurrences",
        )
    )


def kg_doc_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RML-style (subj, pred, obj) triples for documents:
    rdf:type, lang + n_chars literals (always-typed, reference semantics),
    source IRI, and one `mentions` edge per linked entity."""
    docs = _docs(spark, sf_dir)
    subj = F.concat(F.lit(f"<{DOC_NS}"), F.col("doc_id"), F.lit(">"))
    xsd_string = "<http://www.w3.org/2001/XMLSchema#string>"
    xsd_int = "<http://www.w3.org/2001/XMLSchema#integer>"
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

    t_type = docs.select(
        subj.alias("subj"),
        F.lit(rdf_type).alias("pred"),
        F.lit(f"<{ONTO}Document>").alias("obj"),
    )
    t_lang = docs.select(
        subj.alias("subj"),
        F.lit(f"<{ONTO}lang>").alias("pred"),
        F.concat(F.lit('"'), F.col("lang"), F.lit(f'"^^{xsd_string}')).alias("obj"),
    )
    t_len = docs.select(
        subj.alias("subj"),
        F.lit(f"<{ONTO}nChars>").alias("pred"),
        F.concat(F.lit('"'), F.col("n_chars"), F.lit(f'"^^{xsd_int}')).alias("obj"),
    )
    t_src = docs.select(
        subj.alias("subj"),
        F.lit(f"<{ONTO}source>").alias("pred"),
        F.concat(F.lit("<http://kg.example.com/source/"), F.col("source"), F.lit(">")).alias(
            "obj"
        ),
    )
    linked = kg_entity_link(spark, sf_dir)
    t_ment = linked.select(
        F.concat(F.lit(f"<{DOC_NS}"), F.col("doc_id"), F.lit(">")).alias("subj"),
        F.lit(f"<{ONTO}mentions>").alias("pred"),
        F.concat(F.lit("<"), F.col("entity_iri"), F.lit(">")).alias("obj"),
    ).distinct()

    out = t_type
    for t in (t_lang, t_len, t_src, t_ment):
        out = out.unionByName(t)
    return out
