"""Driver-contract queries that exercise the REAL RML engine (parser ->
compiler -> triples) over the synthetic parquet tables, so the DuckDB oracle
can check the engine's operator semantics (subject minting, space-discard,
class triples, typed literals, referencing-object-map join, self-join)
end-to-end on data DuckDB can see."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .rml.compiler import materialize_all
from .rml.parser import parse_mapping_text

_PREFIXES = """
@prefix rr: <http://www.w3.org/ns/r2rml#>.
@prefix rml: <http://semweb.mmlab.be/ns/rml#>.
@prefix ex: <http://ex.org/>.
@prefix xsd: <http://www.w3.org/2001/XMLSchema#>.
"""


def _run(spark: SparkSession, mapping: str) -> DataFrame:
    maps = parse_mapping_text(mapping)
    return materialize_all(spark, maps).select("subj", "pred", "obj")


def rml_nation_region_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class triples + typed literals + a cross-source referencing join
    (nation -> region), all through the mapping engine."""
    mapping = (
        _PREFIXES
        + f"""
<#NationMap> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{sf_dir}/nation.parquet" ];
  rr:subjectMap [ rr:template "http://ex.org/nation/{{n_nationkey}}"; rr:class ex:Nation ];
  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "n_name" ] ];
  rr:predicateObjectMap [ rr:predicate ex:key;
    rr:objectMap [ rml:reference "n_nationkey"; rr:datatype xsd:integer ] ];
  rr:predicateObjectMap [ rr:predicate ex:inRegion;
    rr:objectMap [ rr:parentTriplesMap <#RegionMap>;
      rr:joinCondition [ rr:child "n_regionkey"; rr:parent "r_regionkey" ]; ]; ].

<#RegionMap> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{sf_dir}/region.parquet" ];
  rr:subjectMap [ rr:template "http://ex.org/region/{{r_regionkey}}"; rr:class ex:Region ];
  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rml:reference "r_name" ] ].
"""
    )
    return _run(spark, mapping)


def rml_subject_space_discard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject minting over a field whose values sometimes contain spaces
    (o_orderpriority, e.g. '4-NOT SPECIFIED') — those rows are discarded
    whole (reference src/materialiser.rs:422-425); dedup on the projected
    fields collapses orders to distinct (priority, status) combos."""
    mapping = (
        _PREFIXES
        + f"""
<#PrioMap> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{sf_dir}/orders.parquet" ];
  rr:subjectMap [ rr:template "http://ex.org/prio/{{o_orderpriority}}/{{o_orderstatus}}";
                  rr:class ex:PriorityStatus ];
  rr:predicateObjectMap [ rr:predicate ex:status;
    rr:objectMap [ rml:reference "o_orderstatus" ] ].
"""
    )
    return _run(spark, mapping)


def rml_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referencing object map whose parent shares the logical source: the
    reference short-circuits to the same physical row (J2,
    src/materialiser.rs:673-677) — the object template is computed from the
    child row, no join executed."""
    mapping = (
        _PREFIXES
        + f"""
<#OrderMap> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{sf_dir}/orders.parquet" ];
  rr:subjectMap [ rr:template "http://ex.org/order/{{o_orderkey}}" ];
  rr:predicateObjectMap [ rr:predicate ex:by;
    rr:objectMap [ rr:parentTriplesMap <#CustRefMap>;
      rr:joinCondition [ rr:child "o_orderkey"; rr:parent "o_orderkey" ]; ]; ].

<#CustRefMap> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{sf_dir}/orders.parquet" ];
  rr:subjectMap [ rr:template "http://ex.org/customer/{{o_custkey}}" ].
"""
    )
    return _run(spark, mapping)


def rml_constant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant objectMaps + unresolved-prefix passthrough: quoted constants
    IRI-wrap, bare CURIE constants expand to typed literals, and a predicate
    with an undeclared prefix passes through raw."""
    mapping = (
        _PREFIXES
        + f"""
<#RegionConst> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{sf_dir}/region.parquet" ];
  rr:subjectMap [ rr:template "http://ex.org/region/{{r_regionkey}}" ];
  rr:predicateObjectMap [ rr:predicate ex:seeAlso;
    rr:objectMap [ rr:constant "http://example.org/static" ] ];
  rr:predicateObjectMap [ rr:predicate ex:kind;
    rr:objectMap [ rr:constant ex:RegionKind ] ];
  rr:predicateObjectMap [ rr:predicate missing:pred;
    rr:objectMap [ rml:reference "r_name" ] ].
"""
    )
    return _run(spark, mapping)
