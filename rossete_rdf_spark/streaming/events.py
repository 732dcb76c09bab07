"""Structured-Streaming twins of the batch event operators.

The reference engine has zero streaming constructs (SURVEY.md §2) — this is
part of the beyond-reference surface: the same hourly aggregation as
relops.events_hourly_agg, expressed over a stream with a watermark so late
events older than the allowed lateness are dropped and state is bounded."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
