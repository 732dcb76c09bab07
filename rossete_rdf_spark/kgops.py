"""KG-construction ops over the `documents` table (the driver-checkable,
batch face of the web-pipeline stages in pipeline/):

  kg_mentions     mention detection (term extraction) over text
  kg_entity_link  dictionary-based entity linking (corpus-derived gazetteer)
  kg_doc_triples  RML-style triple materialisation for documents

These are the same shapes the web pipeline runs over (url, warc_ts, html,
text, lang) pages; here they run over the synthetic documents table so the
driver can oracle-check them in DuckDB.

Scan discipline (the 100 TB concern): `kg_doc_triples` reads `documents`
exactly twice — one column-pruned scan of the metadata columns (doc_id, lang,
n_chars, source) expanded to four triples per row via a single array+explode
(the same single-pass pattern as rml/compiler.py), and one scan of (doc_id,
text) for the mention chain. The gazetteer is a hash aggregate over the
mention rows broadcast back onto them — no second tokenization pass, no
shuffle of the fact side, and no window sort on the (potentially hub-skewed)
term key."""

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


def linked_mentions_from(docs: DataFrame) -> DataFrame:
    """Mention rows whose term clears the gazetteer bar, plus n_docs.

    Because mentions_from is already one row per (doc_id, mention), the
    per-term distinct-doc count is a plain groupBy(mention).count() hash
    aggregate; the (small, threshold-filtered) gazetteer broadcasts back
    onto the mention rows. NOT a count() window over mention: WindowExec
    sorts each partition by the key — the shape that inverts under
    parallelism here (BENCH.md) — and a hub term's partition can't be
    skew-split by AQE, whereas the hash agg takes map-side partials and the
    broadcast join never shuffles the fact side. Catalyst's ReuseExchange
    dedupes the shared mention-aggregate subtree, so `documents` is still
    scanned exactly once (asserted in tests/test_plans.py)."""
    m = mentions_from(docs)
    # max(n_occurrences) > 0 is always true (counts are >= 1) — it exists so
    # the optimizer cannot prune n_occurrences out of this branch: pruned,
    # the two (doc_id, mention) partial aggregates stop being canonically
    # equal and AQE re-scans + re-tokenizes the corpus for the gazetteer
    # instead of reusing the mention shuffle stage (verified in
    # tests/test_plans.py: one scan, one exchange, reused)
    gaz = (
        m.groupBy("mention")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.max("n_occurrences").alias("__t"))
        .filter((F.col("n_docs") >= MIN_ENTITY_DOCS) & (F.col("__t") > 0))
        .drop("__t")
    )
    return m.join(F.broadcast(gaz), "mention").select(
        "doc_id", "mention", "n_occurrences", "n_docs"
    )


def entity_dictionary(docs: DataFrame) -> DataFrame:
    """Corpus-derived gazetteer: (entity=mention term, n_docs). At web scale
    the dictionary side is small -> broadcast into downstream link joins."""
    return (
        linked_mentions_from(docs)
        .select(F.col("mention").alias("entity"), "n_docs")
        .distinct()
    )


def kg_entity_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mention, entity_iri, n_occurrences) — mention rows whose term
    is in the corpus gazetteer."""
    return linked_mentions_from(_docs(spark, sf_dir)).select(
        "doc_id",
        "mention",
        F.concat(F.lit(ENTITY_NS), F.col("mention")).alias("entity_iri"),
        "n_occurrences",
    )


def kg_doc_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RML-style (subj, pred, obj) triples for documents:
    rdf:type, lang + n_chars literals (always-typed, reference semantics),
    source IRI, and one `mentions` edge per linked entity.

    The four per-document triples come from ONE metadata scan via
    array+explode (cf. rml/compiler.py single-pass pattern); the mention
    edges reuse the shared mention aggregate."""
    docs = _docs(spark, sf_dir)
    subj = F.concat(F.lit(f"<{DOC_NS}"), F.col("doc_id"), F.lit(">"))
    xsd_string = "<http://www.w3.org/2001/XMLSchema#string>"
    xsd_int = "<http://www.w3.org/2001/XMLSchema#integer>"
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

    def po(pred, obj):
        return F.struct(pred.alias("pred"), obj.alias("obj"))

    per_doc = docs.select(
        subj.alias("subj"),
        F.explode(
            F.array(
                po(F.lit(rdf_type), F.lit(f"<{ONTO}Document>")),
                po(
                    F.lit(f"<{ONTO}lang>"),
                    F.concat(F.lit('"'), F.col("lang"), F.lit(f'"^^{xsd_string}')),
                ),
                po(
                    F.lit(f"<{ONTO}nChars>"),
                    F.concat(F.lit('"'), F.col("n_chars"), F.lit(f'"^^{xsd_int}')),
                ),
                po(
                    F.lit(f"<{ONTO}source>"),
                    F.concat(
                        F.lit("<http://kg.example.com/source/"),
                        F.col("source"),
                        F.lit(">"),
                    ),
                ),
            )
        ).alias("t"),
    ).select("subj", F.col("t.pred").alias("pred"), F.col("t.obj").alias("obj"))

    t_ment = (
        linked_mentions_from(docs)
        # always-true (counts are >= 1): stops the optimizer pruning
        # n_occurrences out of this branch, which would desynchronize it
        # from the gazetteer branch's aggregate and defeat AQE stage reuse
        # (same trick as linked_mentions_from; plan-asserted in test_plans)
        .filter(F.col("n_occurrences") > 0)
        .select(
            F.concat(F.lit(f"<{DOC_NS}"), F.col("doc_id"), F.lit(">")).alias("subj"),
            F.lit(f"<{ONTO}mentions>").alias("pred"),
            F.concat(F.lit(f"<{ENTITY_NS}"), F.col("mention"), F.lit(">")).alias("obj"),
        )
        .distinct()
    )
    return per_doc.unionByName(t_ment)
