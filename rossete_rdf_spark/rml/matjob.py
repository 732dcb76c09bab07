"""Synthetic large-scale RML materialization job — the scaling workload.

Builds child/parent relations with `spark.range` (fully distributed, no
external data), then runs the engine's core operators at scale:
  P2 projected-field dedup (window first-occurrence)
  P3 subject minting (template concat + space-discard)
  J1 referencing-object-map join with first-match parent collapse
  W1 triple assembly
This is the join/shuffle-dominated heart of graph materialization — the part
whose throughput determines 100 TB feasibility — expressed with exactly the
same compiler primitives queries use (first-occurrence window + equi-join)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    wc = Window.partitionBy("c_id", "c_ref").orderBy("c_attr")
    child = (
        child.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # J1 parent collapse: first row per join key by ingest order
    wp = Window.partitionBy("p_key").orderBy("p_rid")
    p1 = (
        parent.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    joined = child.join(p1, child["c_ref"] == p1["p_key"], "inner")

    # P3 + W1: mint subject/object IRIs, assemble triples
    triples = joined.select(
        F.concat(
            F.lit("<http://ex.org/child/"), F.col("c_id"), F.lit(">")
        ).alias("subj"),
        F.lit("<http://ex.org/ref>").alias("pred"),
        F.concat(
            F.lit("<http://ex.org/parent/"), F.col("p_name"), F.lit(">")
        ).alias("obj"),
    ).filter(~F.col("subj").contains(" "))
    return triples.count()
