"""Logical-source loader tests (S1/S2/S3 semantics)."""

from __future__ import annotations

import pytest

from rossete_rdf_spark.rml.ast import LogicalSource
from rossete_rdf_spark.rml.sources import RID, load_logical_source, sanitize


def test_csv_missing_column_is_hard_error(spark, tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("x,y\n1,2\n")
    src = LogicalSource(source=str(p), fmt="csv")
    with pytest.raises(KeyError):
        load_logical_source(spark, src, ["x", "nope"])


def test_csv_null_becomes_empty_string(spark, tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("x,y\n1,\n,2\n")
    src = LogicalSource(source=str(p), fmt="csv")
    df = load_logical_source(spark, src, ["x", "y"])
    rows = sorted((r[sanitize("x")], r[sanitize("y")]) for r in df.collect())
    assert rows == [("", "2"), ("1", "")]


def test_tsv_delimiter(spark, tmp_path):
    p = tmp_path / "a.tsv"
    p.write_text("x\ty\n1\t2\n")
    src = LogicalSource(source=str(p), fmt="tsv")
    df = load_logical_source(spark, src, ["y"])
    assert df.collect()[0][sanitize("y")] == "2"


def test_json_dotted_paths_and_missing_field(spark, tmp_path):
    p = tmp_path / "a.json"
    p.write_text('{"a": {"b": "v", "n": 3}, "arr": [1,2]}')
    src = LogicalSource(source=str(p), fmt="json", iterator="$")
    df = load_logical_source(spark, src, ["a.b", "a.n", "a.miss", "arr"])
    r = df.collect()[0]
    assert r[sanitize("a.b")] == "v"
    assert r[sanitize("a.n")] == "3"  # scalar coerced to string
    assert r[sanitize("a.miss")] == ""  # absent -> ''
    assert r[sanitize("arr")] == ""  # non-scalar skipped -> ''


def test_json_array_iterator_explodes(spark, tmp_path):
    p = tmp_path / "b.json"
    p.write_text('{"items": [{"k": "a"}, {"k": "b"}]}')
    src = LogicalSource(source=str(p), fmt="json", iterator="$.items[*]")
    df = load_logical_source(spark, src, ["k"])
    assert sorted(r[sanitize("k")] for r in df.collect()) == ["a", "b"]


def test_xml_stages_zero_rows(spark, tmp_path):
    p = tmp_path / "c.xml"
    p.write_text("<r><b id='1'/></r>")
    src = LogicalSource(source=str(p), fmt="xml", iterator="/r/b")
    df = load_logical_source(spark, src, ["@id"])
    assert df.count() == 0
    assert set(df.columns) == {sanitize("@id"), RID}


def test_rid_preserves_file_order(spark, tmp_path):
    p = tmp_path / "o.csv"
    p.write_text("x\n" + "\n".join(str(i) for i in range(100)))
    src = LogicalSource(source=str(p), fmt="csv")
    df = load_logical_source(spark, src, ["x"]).orderBy(RID)
    vals = [int(r[sanitize("x")]) for r in df.collect()]
    assert vals == list(range(100))
