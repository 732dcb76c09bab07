"""Structured-Streaming twins of the batch event operators.

The reference engine has zero streaming constructs (SURVEY.md §2) — this is
part of the beyond-reference surface: the same hourly aggregation as
relops.events_hourly_agg, expressed over a stream with a watermark so late
events older than the allowed lateness are dropped and state is bounded."""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SINK_SEQ = itertools.count()


def streaming_hourly_agg(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """events stream (ts, event_type, value) -> windowed counts/sums.

    Output schema matches the batch twin (hour, event_type, n_events,
    sum_value) so a batch backfill and the live stream can union."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_hourly_agg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: run the REAL streaming pipeline (readStream ->
    watermarked windowed agg -> memory sink) over the events parquet with an
    availableNow trigger, then return the sink table. Because the whole file
    arrives in one micro-batch, the watermark drops nothing and the result
    equals the batch twin — which is exactly why this streaming query can
    carry a full DuckDB oracle (same SQL as events_hourly_agg)."""
    import os
    import re
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    # FileStreamSource ingests directories; expose the single parquet file
    # through a per-sf_dir symlink dir (zero-copy)
    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_")
    stream_dir = os.path.join(tempfile.gettempdir(), f"rossete_stream_{tag}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    out = streaming_hourly_agg(stream)
    name = f"streaming_hourly_agg_sink_{next(_SINK_SEQ)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
