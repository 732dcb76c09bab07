"""Parser unit tests — behaviors pinned to reference src/parser.rs."""

import pytest

from rossete_rdf_spark.rml.ast import JoinObject, Template
from rossete_rdf_spark.rml.parser import (
    parse_mapping_dir,
    parse_mapping_text,
    remove_comments,
)

MAP = """
@prefix rr: <http://www.w3.org/ns/r2rml#>.
@prefix rml: <http://semweb.mmlab.be/ns/rml#>.
@prefix ql: <http://semweb.mmlab.be/ns/ql#>.
@prefix ex: <http://ex.org/>.
@base <http://base.org/ns#>.

# full-line comment with rr:template "junk{x}"
<#M1> a rr:TriplesMap;
  rml:logicalSource [
    rml:source "./data/a.csv" ;        # trailing comment
    rml:referenceFormulation ql:CSV
  ];
  rr:subjectMap [
    rr:template "http://s.org/{id}/{kind}";
    rr:class ex:Thing
  ];
  rr:predicateObjectMap [
    rr:predicate ex:name;
    rr:objectMap [ rml:reference "name"; rr:datatype ex:dt ]
  ];
  rr:predicateObjectMap [
    rr:predicate ex:link;
    rr:objectMap [
      rr:parentTriplesMap <#M2>;
      rr:joinCondition [ rr:child "kind"; rr:parent "k" ];
    ];
  ].

<#M2> a rr:TriplesMap;
  rml:logicalSource [ rml:source "./data/b.json"; rml:iterator "$" ];
  rr:subjectMap [ rr:template "http://t.org/{k}" ].
"""


def test_remove_comments_protects_iris():
    # reference unit-tests this exact behavior (src/parser.rs:581-612)
    assert remove_comments("<http://x#y> rr:a b # tail") == "<http://x#y> rr:a b "
    assert remove_comments("# whole line") == ""
    assert remove_comments('p "a#b" # tail') == 'p "a#b" '
    assert remove_comments("<#Name> a rr:TriplesMap;") == "<#Name> a rr:TriplesMap;"


def test_template_fields_and_chunks():
    t = Template("http://s.org/{id}/{kind}")
    assert t.fields == ["id", "kind"]
    assert t.chunks == ["http://s.org/", "/", ""]


def test_parse_basic_structure():
    maps = parse_mapping_text(MAP, base_dir="/tmp/x")
    assert [m.name for m in maps] == ["M1", "M2"]
    m1, m2 = maps
    assert m1.source.fmt == "csv"
    assert m1.source.source == "/tmp/x/data/a.csv"
    assert m1.subject.rr_class == "ex:Thing"
    assert m1.subject.template.fields == ["id", "kind"]
    assert m1.poms[0].object.reference == "name"
    assert m1.poms[0].object.datatype == "ex:dt"
    j = m1.poms[1].object
    assert isinstance(j, JoinObject)
    assert j.parent_map == "M2"
    assert j.conditions == (("kind", "k"),)
    assert m2.source.fmt == "json"
    assert m2.source.iterator == "$"
    # prefixes shared per file, base under ''
    assert m1.prefixes["ex:"] == "http://ex.org/"
    assert m1.prefixes[""] == "http://base.org/ns#"
    assert m1.prefixes is m2.prefixes


def test_subject_template_requires_placeholder():
    bad = """
<#B> a rr:TriplesMap;
  rml:logicalSource [ rml:source "a.csv" ];
  rr:subjectMap [ rr:template "http://no-placeholder/" ].
"""
    with pytest.raises(ValueError):
        parse_mapping_text(bad)


def test_reference_examples_parse(reference_dir):
    maps = parse_mapping_dir(f"{reference_dir}/examples/mappings", base_dir=reference_dir)
    names = {m.name for m in maps}
    assert names == {
        "AirportMapping",
        "TransportMapping",
        "VenueMapping",
        "TriplesMap1",
        "TriplesMap2",
    }
    by = {m.name: m for m in maps}
    assert by["AirportMapping"].referenced_fields() == ["id", "stop", "latitude", "longitude"]
    assert by["TransportMapping"].source.fmt == "xml"
    # map4 declares no prefixes -> ex: must be unresolved for TriplesMap1
    assert "ex:" not in by["TriplesMap1"].prefixes


def test_multi_join_condition_composite_key():
    # repeated rr:joinCondition blocks = composite join key; the reference
    # collects every pair and ANDs them (src/materialiser.rs:721-735)
    text = """
<#C> a rr:TriplesMap;
  rml:logicalSource [ rml:source "a.csv" ];
  rr:subjectMap [ rr:template "http://s/{x}" ];
  rr:predicateObjectMap [
    rr:predicate ex:link;
    rr:objectMap [
      rr:parentTriplesMap <#P>;
      rr:joinCondition [ rr:child "x1"; rr:parent "p1" ];
      rr:joinCondition [ rr:child "x2"; rr:parent "p2" ];
    ];
  ].
<#P> a rr:TriplesMap;
  rml:logicalSource [ rml:source "b.csv" ];
  rr:subjectMap [ rr:template "http://t/{p1}" ].
"""
    maps = parse_mapping_text(text)
    j = maps[0].poms[0].object
    assert isinstance(j, JoinObject)
    assert j.conditions == (("x1", "p1"), ("x2", "p2"))


def test_remove_comments_escaped_quote():
    # a backslash-escaped quote inside a string must not toggle string state:
    # the '#' is still inside the quoted value and survives
    assert remove_comments('p "a\\"b #c" # tail') == 'p "a\\"b #c" '
    # escaped backslash before the closing quote: quote DOES close the string
    assert remove_comments('p "a\\\\" # tail') == 'p "a\\\\" '


def test_duplicate_logical_source_raises():
    bad = """
<#D> a rr:TriplesMap;
  rml:logicalSource [ rml:source "a.csv" ];
  rml:logicalSource [ rml:source "b.csv" ];
  rr:subjectMap [ rr:template "http://s/{id}" ].
"""
    # exactly-one validation, matching the reference's hard error
    # (src/mappings/maps.rs:29-56) — last-wins would read the wrong table
    with pytest.raises(ValueError, match="more than one rml:logicalSource"):
        parse_mapping_text(bad)


def test_duplicate_subject_map_raises():
    bad = """
<#D> a rr:TriplesMap;
  rml:logicalSource [ rml:source "a.csv" ];
  rr:subjectMap [ rr:template "http://s/{id}" ];
  rr:subjectMap [ rr:template "http://t/{id}" ].
"""
    with pytest.raises(ValueError, match="more than one rr:subjectMap"):
        parse_mapping_text(bad)
