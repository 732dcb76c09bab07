"""Streaming twin + multimodal plumbing tests."""

from __future__ import annotations

from rossete_rdf_spark.pipeline.multimodal import (
    FEATURE_DIM,
    decode_image_stub,
    extract_media_features,
    synth_media,
)
from rossete_rdf_spark.relops import events_hourly_agg
from rossete_rdf_spark.streaming import streaming_hourly_agg

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_hourly_matches_batch(spark, tmp_path):
    """Run the streaming agg over the events table as a file stream with
    one trigger; results must equal the batch twin."""
    batch_df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # file-stream source needs a directory: re-land the table in one
    stream_dir = str(tmp_path / "events_stream")
    batch_df.write.parquet(stream_dir)
    stream = spark.readStream.schema(batch_df.schema).parquet(stream_dir)
    out = streaming_hourly_agg(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    exp = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly_agg(spark, SF_DIR).collect()
    }
    assert got == exp and len(got) > 0


def test_multimodal_feature_plumbing(spark):
    media = synth_media(spark, 90, partitions=4)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 90
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["kind"] == "image"
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    # deterministic: same payload bytes -> same features
    expected = decode_image_stub(b"media-payload-7")
    assert [round(x, 6) for x in by_id[7]["features"]] == [
        round(x, 6) for x in expected
    ]
    assert by_id[7]["n_bytes"] == len(b"media-payload-7")


def test_multimodal_real_decode_is_gated():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"x", fake=False)
