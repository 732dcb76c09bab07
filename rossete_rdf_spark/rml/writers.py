"""Graph sinks: N-Triples text, Turtle text, and a partitioned quad table.

The reference streams text to a single writer thread (src/materialiser.rs:
113-133, NT :135-217, TTL :220-319); here serialization is a Column
expression and the write is a distributed `.write.text` / `.write.parquet`.
Both writers emit the `a` shorthand for rdf:type like the reference's
exemplar outputs (output.nt:1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .terms import RDF_TYPE

def _pred_out() -> F.Column:
    return F.when(F.col("pred") == RDF_TYPE, F.lit("a")).otherwise(F.col("pred"))


def nt_lines(triples: DataFrame) -> DataFrame:
    """(subj,pred,obj[,graph]) -> one `s p o .` line per triple."""
    return triples.select(
        F.format_string("%s %s %s .", F.col("subj"), _pred_out(), F.col("obj")).alias(
            "value"
        )
    )


def write_nt(triples: DataFrame, path: str) -> None:
    nt_lines(triples).write.mode("overwrite").text(path)


def ttl_lines(triples: DataFrame) -> DataFrame:
    """Subject-grouped Turtle: `s p1 o1 ;\n\tp2 o2 .` — one aggregation on
    subj (the reference groups per row buffer, src/materialiser.rs:220-319)."""
    grouped = (
        triples.select("subj", _pred_out().alias("p"), F.col("obj"))
        .groupBy("subj")
        .agg(F.collect_list(F.format_string("%s %s", F.col("p"), F.col("obj"))).alias("po"))
    )
    return grouped.select(
        F.concat(
            F.col("subj"),
            F.lit(" "),
            F.concat_ws(" ;\n\t\t", F.col("po")),
            F.lit(" ."),
        ).alias("value")
    )


def write_ttl(triples: DataFrame, path: str) -> None:
    ttl_lines(triples).write.mode("overwrite").text(path)


def write_quad_table(triples: DataFrame, path: str, buckets: int = 0) -> None:
    """Partitioned (subj, pred, obj, graph) table — the scale sink.

    Partitioned by `graph` (mapping/provenance id) so per-mapping reprocessing
    prunes files; optionally pre-repartitioned by subj hash so downstream
    subject-grouped consumers (TTL export, entity assembly) avoid a shuffle.
    On a real cluster this would be an Iceberg table with bucket(subj)
    partition transform; plain parquet keeps the sandbox dependency-free."""
    df = triples
    if buckets:
        df = df.repartition(buckets, F.col("subj"))
    df.write.mode("overwrite").partitionBy("graph").parquet(path)
