"""Stateful streaming sessionization: state must carry across MICRO-BATCHES,
not just within one. Events are split into two files, maxFilesPerTrigger=1
forces two batches, and a session spanning the file boundary must come out
as ONE session with the combined count (update-mode emissions: the latest
row per (user, session) is the current total)."""

from __future__ import annotations

import datetime as dt

from rossete_rdf_spark.streaming.events import streaming_sessionize


def test_state_spans_micro_batches(spark, tmp_path):
    base = dt.datetime(2025, 1, 1, 10, 0, 0)

    def ev(event_id, minutes, user=1, value=1.0):
        return (event_id, base + dt.timedelta(minutes=minutes), user, value)

    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    # batch 1: two events 10 min apart (one open session)
    spark.createDataFrame([ev(1, 0), ev(2, 10)], schema).coalesce(1).write.parquet(
        str(tmp_path / "in" / "f1")
    )
    # batch 2: continues the session (+10 min), then a >30min gap -> session 2
    spark.createDataFrame([ev(3, 20), ev(4, 120)], schema).coalesce(1).write.parquet(
        str(tmp_path / "in" / "f2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = streaming_sessionize(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sess_state_test").collect()

    # take the LATEST emission per session = the one with the max count
    final = {}
    for r in rows:
        k = (r["user_id"], r["session_id"])
        if k not in final or r["n_events"] > final[k]["n_events"]:
            final[k] = r

    assert set(final) == {(1, 1), (1, 2)}
    s1, s2 = final[(1, 1)], final[(1, 2)]
    # session 1 spans the micro-batch boundary: 3 events, 20-minute span
    assert s1["n_events"] == 3
    assert s1["session_start"] == "2025-01-01 10:00:00"
    assert s1["session_end"] == "2025-01-01 10:20:00"
    assert s1["sum_value"] == 3.0
    # the 100-minute gap opened session 2
    assert s2["n_events"] == 1
    assert s2["session_start"] == "2025-01-01 12:00:00"
    # stream processed in (at least) two batches, so session 1 was emitted
    # more than once (update semantics)
    assert len(rows) >= 3
