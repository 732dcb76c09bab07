"""Compile TriplesMap ASTs into Spark DataFrame plans.

Each TriplesMap becomes one declarative DataFrame pipeline producing
(subj, pred, obj, graph) string columns; all maps union together. Where the
reference runs a per-row SQLite lookup under a global mutex for referencing
object maps (src/materialiser.rs:547-616 — effectively serialized), we run
one set-oriented distributed join per referencing predicate, with the parent
side collapsed to its FIRST matching row per join key to preserve the
reference's `query_row` first-match semantics (src/materialiser.rs:573-580).

Scale notes (100 TB design point):
- term construction is pure Column exprs -> whole-stage codegen, no Python
- the per-map dedup and the parent first-match collapse are min_by hash
  aggregations (map-side partial agg, NO sort exchange — a row_number window
  would sort the full relation on the keys)
- the referencing join is an equi-join that AQE can broadcast (small dims)
  or skew-split (hub keys); no driver-side loops
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ast import JoinObject, ObjectTerm, TriplesMap
from .config import EngineConfig
from .sources import RID, colmap_for, load_logical_source, sanitize
from .terms import (
    RDF_TYPE,
    expand_curie,
    iri_is_valid,
    object_term_column,
    template_column,
)

TRIPLE_COLS = ("subj", "pred", "obj", "graph")


def _same_source(a: TriplesMap, b: TriplesMap) -> bool:
    return a.source.source == b.source.source and (a.source.iterator or "") == (
        b.source.iterator or ""
    )


def first_occurrence_dedup(df: DataFrame, keys: list[str], order_col: str = RID) -> DataFrame:
    """DISTINCT on `keys` keeping the first-ingested row — the reference's
    `GROUP BY fields HAVING MIN(col_id)` (src/materialiser.rs:358) and its
    ingest-time duplicate delete (src/input.rs:454-466) collapse to ONE
    hash aggregation: min_by(struct(other cols), order_col).

    Hash agg, not a row_number window, on purpose: the window needs a full
    sort exchange on the keys; min_by gets map-side partial aggregation and
    no sort — measured 3.6x faster at 4 cores and, unlike the sort, it
    SCALES with cores (the window inverted 4.9s->6.1s from 1 to 4 cores on
    10M rows in this environment; min_by went 5.8s->1.6s)."""
    others = [c for c in df.columns if c not in keys]
    if not others:
        return df.dropDuplicates(keys)
    if others == [order_col]:
        # the only carried column IS the ordering column: min_by(x, x) is
        # min(x) — a primitive-buffer declarative aggregate that stays in
        # whole-stage HashAggregate, where the struct-valued min_by below
        # forces ObjectHashAggregate (per-group JVM objects). On the
        # 40M-unique-key dedup of the scaling workload this is the
        # difference between the UnsafeRow hash map and object
        # aggregation + GC (guide §2.3: narrower aggregation state).
        return df.groupBy(*[F.col(k) for k in keys]).agg(
            F.min(order_col).alias(order_col)
        )
    row = F.min_by(F.struct(*[F.col(c) for c in others]), F.col(order_col))
    return df.groupBy(*[F.col(k) for k in keys]).agg(row.alias("__row")).select(
        *keys, "__row.*"
    )


def materialize_map(
    spark: SparkSession,
    tmap: TriplesMap,
    maps_by_name: dict[str, TriplesMap],
    config: EngineConfig | None = None,
) -> DataFrame:
    """One TriplesMap -> DataFrame(subj, pred, obj, graph)."""
    own_fields = tmap.referenced_fields()

    # Self-join parents need the parent's subject-template fields from the
    # SAME row (reference short-circuits to a col_id == col_id lookup,
    # src/materialiser.rs:673-677): project them too, but keep them OUT of
    # the dedup keys — the reference dedups on the map's own fields only and
    # then fetches the kept row's other columns by rowid.
    extra_fields: list[str] = []
    for pom in tmap.poms:
        if isinstance(pom.object, JoinObject):
            parent = maps_by_name.get(pom.object.parent_map)
            if parent is not None and _same_source(tmap, parent):
                for f in parent.subject.template.fields:
                    if f not in own_fields and f not in extra_fields:
                        extra_fields.append(f)

    all_fields = own_fields + extra_fields
    cmap = colmap_for(all_fields)
    child = load_logical_source(spark, tmap.source, all_fields, config=config)
    dedup_keys = [cmap[f] for f in own_fields]
    if dedup_keys:
        child = first_occurrence_dedup(child, dedup_keys)

    subj = template_column(tmap.subject.template, cmap)
    child = child.withColumn("subj", subj).filter(iri_is_valid(F.col("subj")))

    graph_iri = tmap.subject.graph or tmap.name
    frames: list[DataFrame] = []

    # All scalar (non-join) predicates — including the rr:class triple and
    # same-source self-joins — are computed in ONE pass over the source:
    # an array of (pred, obj) structs per row, nulled-out when the term's
    # keep-condition fails, then explode. A union of per-predicate frames
    # would re-scan the source once per predicate; at 100 TB that's the
    # difference between 1 and N passes.
    scalar_terms: list = []

    if tmap.subject.rr_class:
        cls = expand_curie(tmap.subject.rr_class, tmap.prefixes, tags=True)
        scalar_terms.append(
            F.struct(F.lit(RDF_TYPE).alias("pred"), F.lit(cls).alias("obj"))
        )

    for pom in tmap.poms:
        pred = expand_curie(pom.predicate, tmap.prefixes, tags=True)
        if isinstance(pom.object, ObjectTerm):
            obj_col, keep = object_term_column(pom.object, tmap.prefixes, cmap)
            scalar_terms.append(
                F.when(
                    keep, F.struct(F.lit(pred).alias("pred"), obj_col.alias("obj"))
                )
            )
        else:
            parent = maps_by_name.get(pom.object.parent_map)
            if parent is not None and _same_source(tmap, parent):
                # J2 self-join: same-row compute, stays in the single pass
                obj_col = template_column(parent.subject.template, cmap)
                scalar_terms.append(
                    F.when(
                        iri_is_valid(obj_col),
                        F.struct(F.lit(pred).alias("pred"), obj_col.alias("obj")),
                    )
                )
            else:
                frames.append(
                    _join_pom_frame(
                        spark, tmap, pom.object, pred, child, cmap, maps_by_name,
                        config=config,
                    )
                )

    if scalar_terms:
        po = F.filter(F.array(*scalar_terms), lambda s: s.isNotNull())
        frames.insert(
            0,
            child.select(F.col("subj"), F.explode(po).alias("po")).select(
                "subj", F.col("po.pred").alias("pred"), F.col("po.obj").alias("obj")
            ),
        )

    if not frames:
        frames = [
            child.select(
                F.col("subj"),
                F.lit(RDF_TYPE).alias("pred"),
                F.lit("<http://www.w3.org/2000/01/rdf-schema#Resource>").alias("obj"),
            ).limit(0)
        ]

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("graph", F.lit(graph_iri))


def _join_pom_frame(
    spark: SparkSession,
    tmap: TriplesMap,
    join: JoinObject,
    pred: str,
    child: DataFrame,
    cmap: dict[str, str],
    maps_by_name: dict[str, TriplesMap],
    config: EngineConfig | None = None,
) -> DataFrame:
    """Referencing object map -> (subj, pred, parentIRI) frame.

    Reference semantics (src/materialiser.rs:547-740): per child row, take the
    FIRST parent row (by ingest order) whose parent fields equal the child's
    join-condition values; no match -> no triple; the parent's subject
    template mints the object IRI (space-discard applies)."""
    parent_map = maps_by_name.get(join.parent_map)
    if parent_map is None:
        raise KeyError(f"{tmap.name}: unknown parentTriplesMap {join.parent_map}")

    if _same_source(tmap, parent_map):
        # Same logical source: the "join" is the same physical row
        # (src/materialiser.rs:673-677) — no join at all, just compute the
        # parent template from this row's columns.
        obj_col = template_column(parent_map.subject.template, cmap)
        return child.filter(iri_is_valid(obj_col)).select(
            F.col("subj"), F.lit(pred).alias("pred"), obj_col.alias("obj")
        )

    parent_fields: list[str] = list(parent_map.subject.template.fields)
    for _child_f, parent_f in join.conditions:
        if parent_f not in parent_fields:
            parent_fields.append(parent_f)
    pmap_cols = {f: "p_" + sanitize(f) for f in parent_fields}

    parent_df = load_logical_source(spark, parent_map.source, parent_fields, config=config)
    parent_df = parent_df.select(
        *[F.col(sanitize(f)).alias(pmap_cols[f]) for f in parent_fields],
        F.col(RID).alias("__prid"),
    )
    join_keys = [pmap_cols[p] for _c, p in join.conditions]
    # first-match collapse: ONE parent row per join-key tuple, by ingest order
    # — same min_by hash aggregation as first_occurrence_dedup (no sort)
    parent_df = first_occurrence_dedup(parent_df, join_keys, order_col="__prid").drop(
        "__prid"
    )

    cond = None
    for child_f, parent_f in join.conditions:
        c = child[cmap[child_f]] == parent_df[pmap_cols[parent_f]]
        cond = c if cond is None else (cond & c)

    joined = child.join(parent_df, cond, "inner")
    obj_col = template_column(parent_map.subject.template, pmap_cols)
    return joined.filter(iri_is_valid(obj_col)).select(
        child["subj"].alias("subj"), F.lit(pred).alias("pred"), obj_col.alias("obj")
    )


def materialize_all(
    spark: SparkSession, maps: list[TriplesMap], config: EngineConfig | None = None
) -> DataFrame:
    """Union of all TriplesMaps' triples: the full graph as one DataFrame."""
    by_name = {m.name: m for m in maps}
    frames = [materialize_map(spark, m, by_name, config=config) for m in maps]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
