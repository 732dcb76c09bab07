"""Web-pipeline tests: extraction invariant, stage correctness, CC,
canonicalization, and checkpoint/resume identity."""

from __future__ import annotations

import os
import shutil

import pytest

from rossete_rdf_spark.graph.cc import connected_components
from rossete_rdf_spark.pipeline import (
    extract_text_bytes,
    load_triples,
    run_kg_pipeline,
    synth_pages,
)
from rossete_rdf_spark.pipeline.canonicalize import canonical_entity_map

N_PAGES = 400


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N_PAGES, partitions=8).cache()


def test_synth_pages_deterministic(spark, pages):
    again = synth_pages(spark, N_PAGES, partitions=4)  # different partitioning
    a = {r["url"]: (r["text"], r["lang"], bytes(r["html"])) for r in pages.collect()}
    b = {r["url"]: (r["text"], r["lang"], bytes(r["html"])) for r in again.collect()}
    assert a == b


def test_extraction_byte_identical_per_url(pages):
    """The pinned invariant: extractor(html) == text, byte for byte."""
    rows = pages.collect()
    assert len(rows) == N_PAGES
    for r in rows:
        assert extract_text_bytes(bytes(r["html"])).decode() == r["text"], r["url"]


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")],
        ["src", "dst"],
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert "p" not in comp  # self-loop only -> no edge -> not a node


def test_connected_components_chain(spark):
    n = 40
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert len(comp) == n + 1
    assert set(comp.values()) == {"n000"}


def test_canonicalize_collapses_variants(spark):
    surfaces = spark.createDataFrame(
        [("sparkle",), ("sparkles",), ("database",), ("databases",), ("qqqq",)],
        ["surface"],
    )
    m = {r["surface"]: r["canonical"] for r in canonical_entity_map(surfaces, 0.5).collect()}
    assert m["sparkle"] == m["sparkles"]
    assert m["database"] == m["databases"]
    assert m["qqqq"] == "qqqq"
    assert m["sparkle"] != m["database"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("kgwork"))


def test_pipeline_end_to_end(spark, pages, workdir):
    full = os.path.join(workdir, "full")
    metrics = run_kg_pipeline(spark, pages, full)
    assert set(metrics.keys()) == {
        "extract", "pagedup", "mentions", "gazetteer", "linked", "canonical",
        "triples",
    }
    assert metrics["extract"]["rows"] == N_PAGES
    kept = metrics["pagedup"]["rows"]
    # the generator plants ~5% near-dups + ~2% exact dups
    assert 0.85 * N_PAGES < kept < N_PAGES
    assert metrics["triples"]["rows"] > 3 * kept  # 3 page triples + mentions
    for st in metrics.values():  # lineage counters recorded per partition
        assert st["rows"] == sum(st["partition_rows"].values())
    t = load_triples(spark, full)
    assert t.columns == ["subj", "pred", "obj", "graph"]
    # near-dup pages produced canonical entity IRIs: every mention object is
    # a canonical surface (mentions graph non-empty)
    assert t.filter(t.graph == "mentions").count() > 0


def test_pipeline_resume_identity(spark, pages, workdir):
    """Kill after stage 3, re-run, final triples identical to the full run."""
    full = os.path.join(workdir, "full")  # built by previous test
    part = os.path.join(workdir, "partial")
    shutil.rmtree(part, ignore_errors=True)
    run_kg_pipeline(spark, pages, part, stop_after="gazetteer")
    assert not os.path.exists(os.path.join(part, "stage_triples.parquet"))
    # resume: completes remaining stages, skips finished ones (their wall
    # times in the manifest stay from run 1)
    run_kg_pipeline(spark, pages, part)
    a = sorted(map(tuple, load_triples(spark, full).collect()))
    b = sorted(map(tuple, load_triples(spark, part).collect()))
    assert a == b


def test_compaction_shrinks_files_and_preserves_content(spark, tmp_path):
    # a fragmented write (32 tiny files) compacts to the byte-derived
    # target count with identical content; a crashed-safe swap leaves no
    # temp dirs behind
    from pyspark.sql import functions as F

    from rossete_rdf_spark.pipeline.compact import (
        compact_parquet_dir,
        parquet_file_count,
    )

    path = str(tmp_path / "frag.parquet")
    df = spark.range(0, 10000, 1, 32).withColumn(
        "v", (F.col("id") * 7 % 1000).cast("long")
    )
    df.write.mode("overwrite").parquet(path)
    assert parquet_file_count(path) == 32
    before = {(r.id, r.v) for r in spark.read.parquet(path).collect()}

    m = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert m["rewritten"] and m["files_before"] == 32 and m["files_after"] == 1
    assert m["rows"] == 10000
    after = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert after == before
    import os

    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__old__")

    # idempotent: already at/below target -> no rewrite
    m2 = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert not m2["rewritten"] and m2["files_after"] == 1


def test_compaction_split_recovery_and_partitioned_guard(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from rossete_rdf_spark.pipeline.compact import (
        compact_parquet_dir,
        parquet_file_count,
    )

    # allow_shuffle=True splits a too-few-file table up to the byte target
    path = str(tmp_path / "big.parquet")
    spark.range(0, 20000, 1, 1).withColumn(
        "pad", F.sha2(F.col("id").cast("string"), 256)
    ).write.mode("overwrite").parquet(path)
    assert parquet_file_count(path) == 1
    bytes_total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    m = compact_parquet_dir(
        spark, path, target_bytes=bytes_total // 4 + 1, allow_shuffle=True
    )
    assert m["rewritten"] and m["files_after"] > 1

    # crash window recovery: original stranded at .__old__ is restored
    rows = {r.id for r in spark.read.parquet(path).collect()}
    os.replace(path, path + ".__old__")
    m2 = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert {r.id for r in spark.read.parquet(path).collect()} == rows
    assert m2["rows"] == 20000

    # Hive-partitioned layouts are rejected, not silently no-oped
    part = str(tmp_path / "part.parquet")
    spark.range(0, 100).withColumn("k", F.col("id") % 3).write.partitionBy(
        "k"
    ).mode("overwrite").parquet(part)
    import pytest

    with pytest.raises(NotImplementedError):
        compact_parquet_dir(spark, part)


def test_compaction_reaps_stale_old_and_rejects_mixed_layout(spark, tmp_path):
    # r6 ADVICE fixes: (1) a crash AFTER the new table swapped in but
    # BEFORE the old copy was removed leaves <path>.__old__ next to a live
    # table — the next invocation (even a no-op) must reap it, or it leaks
    # a full table copy forever; (2) a MIXED layout (top-level parquet plus
    # key=*/ subdirs) must hit the NotImplementedError boundary, not a
    # confusing row-count-mismatch abort.
    import os
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from rossete_rdf_spark.pipeline.compact import compact_parquet_dir

    path = str(tmp_path / "t.parquet")
    spark.range(0, 1000, 1, 2).write.mode("overwrite").parquet(path)
    # simulate the post-swap crash window: live table + stale .__old__ copy
    shutil.copytree(path, path + ".__old__")
    m = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert not os.path.exists(path + ".__old__")  # reaped on entry
    assert m["rows"] == 1000
    assert {r.id for r in spark.read.parquet(path).collect()} == set(range(1000))

    # mixed layout: nested data dir alongside top-level files
    os.makedirs(os.path.join(path, "k=0"))
    srcfile = next(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    shutil.copy(srcfile, os.path.join(path, "k=0", "part-0.parquet"))
    with pytest.raises(NotImplementedError):
        compact_parquet_dir(spark, path)


def test_unpivot_pivot_types_cover_generated_events(spark):
    # r6 ADVICE: events_unpivot_roundtrip only round-trips event types in
    # PIVOT_TYPES while its oracle aggregates ALL types — pin the data
    # contract here so a 6th generated event type fails loudly in CI
    # instead of silently diverging query and oracle.
    from rossete_rdf_spark.relops import PIVOT_TYPES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        events = spark.read.parquet(f"{sf}/events.parquet")
        types = {r.event_type for r in events.select("event_type").distinct().collect()}
        assert types <= set(PIVOT_TYPES), (sf, types)
