"""Synthetic large-scale RML materialization job — the scaling workload.

Builds child/parent relations with `spark.range` (fully distributed, no
external data), then runs the engine's core operators at scale:
  P2 projected-field dedup (first-occurrence min_by hash aggregation)
  P3 subject minting (template concat + space-discard)
  J1 referencing-object-map join with first-match parent collapse
  P4/P5 multi-predicate emit in the compiler's array+explode single pass
  W1 triple assembly
This is the join/shuffle-dominated heart of graph materialization — the part
whose throughput determines 100 TB feasibility — expressed with exactly the
same compiler primitives the queries use (first_occurrence_dedup + equi-join
+ array/explode term pass)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .compiler import first_occurrence_dedup


def rml_materialize_job(
    spark: SparkSession, n_child: int, partitions: int = 64, fanout: int = 4
) -> int:
    """Materialize `child -> parent` reference triples for n_child rows
    against a parent table with `fanout` duplicate rows per key (exercising
    the first-match collapse). Returns the triple count."""
    n_parent_keys = max(n_child // 10, 1)

    child = spark.range(0, n_child, 1, partitions).select(
        F.col("id").alias("c_id"),
        (F.col("id") % n_parent_keys).alias("c_ref"),
        (F.col("id") % 97).alias("c_attr"),
    )
    parent = spark.range(0, n_parent_keys * fanout, 1, partitions).select(
        (F.col("id") % n_parent_keys).alias("p_key"),
        F.col("id").alias("p_rid"),
        F.md5(F.col("id").cast("string")).alias("p_name"),
    )

    # P2: dedup child on its projected fields, first occurrence by ingest id
    # (the engine's own primitive: min_by hash aggregation, no sort exchange).
    # NOTE (r6, measured): pre-partitioning the dedup by the join key to
    # share one exchange (guide §2.4) was tried — dedup keyed by c_ref +
    # shuffle_hash-hinted join, one 40M-row shuffle instead of two — and ran
    # 25% SLOWER at 1 core (15.2s vs 12.0s on 10M rows, interleaved reps,
    # clean probes): the planner's two-exchange shape lets AQE rewrite the
    # join to shuffled-hash from bare shuffle stages and keeps the partial
    # aggregation below the exchange. Kept the planner shape.
    child = first_occurrence_dedup(child, ["c_id", "c_ref"], order_col="c_attr")

    # J1 parent collapse: first row per join key by ingest order
    p1 = first_occurrence_dedup(parent, ["p_key"], order_col="p_rid")

    joined = child.join(p1, child["c_ref"] == p1["p_key"], "inner")

    # P3-P5 + W1: mint the subject IRI, then emit ALL scalar predicates in
    # the compiler's single-pass array+explode shape (compiler.py:90-139) —
    # a class triple, two typed literals, and the referencing-object triple.
    # This matches what materialize_map really does per row (real TriplesMaps
    # carry several predicateObjectMaps), not a one-triple strawman.
    subj = F.concat(F.lit("<http://ex.org/child/"), F.col("c_id"), F.lit(">"))
    xsd_int = '"^^<http://www.w3.org/2001/XMLSchema#integer>'

    def po(pred: str, obj) -> F.Column:
        return F.struct(F.lit(pred).alias("pred"), obj.alias("obj"))

    def lit_int(col) -> F.Column:
        # concat, not format_string: String.format allocates per call and is
        # the dominant cost of the term pass (UTF8String concat is ~2x faster)
        return F.concat(F.lit('"'), col, F.lit(xsd_int))

    terms = F.array(
        po("a", F.lit("<http://ex.org/Child>")),
        po("<http://ex.org/id>", lit_int(F.col("c_id"))),
        po("<http://ex.org/attr>", lit_int(F.col("c_attr"))),
        po(
            "<http://ex.org/ref>",
            F.concat(F.lit("<http://ex.org/parent/"), F.col("p_name"), F.lit(">")),
        ),
    )
    triples = (
        joined.select(subj.alias("subj"), F.explode(terms).alias("t"))
        .select("subj", F.col("t.pred").alias("pred"), F.col("t.obj").alias("obj"))
        .filter(~F.col("subj").contains(" "))
    )
    return triples.count()
