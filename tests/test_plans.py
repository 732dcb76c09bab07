"""Physical-plan quality checks: the optimizations we rely on at 100 TB must
actually appear in the plans — column pruning to the parquet scan, broadcast
of small sides, no Python in JVM-only pipelines."""

from rossete_rdf_spark.kgops import kg_doc_triples, kg_entity_link
from rossete_rdf_spark.relops import tpch_q1_pricing, tpch_q3_shipping
from rossete_rdf_spark.rmlops import rml_nation_region_graph

SF = "/root/testdata/sf0.001"
# the skew test needs enough fact bytes for its 16KB skew thresholds to trip
SF_SKEW = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_scan_is_column_pruned(spark):
    plan = _plan(tpch_q1_pricing(spark, SF))
    # the lineitem scan must read only the 6 referenced columns, not all 11
    assert "ReadSchema" in plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_shipdate" not in scan and "l_partkey" not in scan
    assert "l_quantity" in scan and "l_returnflag" in scan


def test_q3_broadcasts_customer(spark):
    plan = _plan(tpch_q3_shipping(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_entity_link_single_scan_broadcast_gazetteer(spark):
    # gazetteer = hash agg over the mention rows, broadcast back: ONE
    # documents scan at runtime (AQE stage reuse dedupes the shared mention
    # aggregate — visible only in the FINAL plan, so execute first), exactly
    # one join and it's a broadcast, and no window sort on the hub-skewable
    # mention key
    df = kg_entity_link(spark, SF)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "ReusedExchange" in final
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "Window" not in final


def test_first_match_join_has_no_sort(spark):
    # parent collapse is min_by hash aggregation; the old row_number window
    # put a per-partition sort exchange in the plan (inverts under
    # parallelism on allocation-heavy stages — BENCH.md measurements)
    from rossete_rdf_spark.relops import rel_first_match_join

    plan = _plan(rel_first_match_join(spark, SF))
    assert "Window" not in plan
    # the packed order_col keeps every min_by buffer primitive -> whole-stage
    # HashAggregate; a struct anywhere in the buffer would drop the plan to
    # SortAggregate and bring the sort back
    assert "HashAggregate" in plan
    assert "Sort (" not in plan and "SortAggregate" not in plan


def test_doc_triples_two_pruned_scans(spark):
    # one metadata scan (array+explode of 4 triples/row) + one text scan for
    # the mention chain (AQE stage reuse collapses the gazetteer branch onto
    # the mention shuffle — final plan only); the old shape scanned
    # documents 4+ times
    df = kg_doc_triples(spark, SF)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 2
    assert "ReusedExchange" in final
    meta_scans = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "text" not in ln
    ]
    assert meta_scans, "expected a metadata scan that prunes the text column"


def test_runtime_filter_join_injects_bloom_filter(spark):
    # the selective dim filter must materialize as a bloom filter probed on
    # the FACT side (might_contain over the join key) — row-level runtime
    # pruning of the big scan before the join exchange; the query function
    # scopes the confs and memoizes the optimized plan, so the filter
    # survives the conf restore
    from rossete_rdf_spark.relops import rel_runtime_filter_join

    df = rel_runtime_filter_join(spark, SF)
    plan = _plan(df)
    assert "might_contain" in plan.lower()
    # and the session confs are back to their defaults afterwards
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).lower().rstrip("b") not in ("0", "")
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_skew_join_actually_splits(spark):
    # rel_skew_join_agg's join shape must be splittable by AQE's
    # OptimizeSkewedJoin: under scoped thresholds (the defaults assume
    # 256MB+ partitions) the executed plan must carry the skew=true SMJ.
    # The decision is made at RUNTIME by AQE, so the confs stay set until
    # after the collect.
    from rossete_rdf_spark.relops import rel_skew_join_agg
    from rossete_rdf_spark.session import scoped_conf

    # hold-past-action idiom: AQE makes the split while the job runs, so the
    # scope stays open across the collect (see scoped_conf's docstring)
    with scoped_conf(spark, {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }):
        df = rel_skew_join_agg(spark, SF_SKEW)
        rows = {r.tag: (r.n_items, r.sum_qty) for r in df.collect()}
        assert rows["grp0"][0] > 5 * rows["grp1"][0]  # the hub is real
        plan = _plan(df)
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final


def test_rml_graph_plan_has_no_python(spark):
    # the whole RML materialization must stay JVM-side: no Python UDF nodes
    plan = _plan(rml_nation_region_graph(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # AQE owns the plan (runtime re-plan + skew handling enabled)
    assert "AdaptiveSparkPlan" in plan


def test_rml_parquet_scan_is_column_pruned(spark):
    # the mapping references n_nationkey/n_name/n_regionkey; the scan must
    # not read n_comment (Catalyst pruning through the string-cast projection)
    plan = _plan(rml_nation_region_graph(spark, SF))
    nation_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "n_nationkey" in ln
    ]
    assert nation_scans
    assert all("n_comment" not in ln for ln in nation_scans)


def test_bgp_lang_side_never_tokenizes(spark):
    # kg_bgp_entity_lang: Catalyst must constant-fold the lang-pattern filter
    # against the mention branch's literal predicate and prune that union
    # child — the lang side reads only metadata columns. Tokenization
    # (split on text) must appear exactly twice in the optimized plan: the
    # mention aggregate and the gazetteer aggregate on the MENTION side
    # (AQE-reused at runtime), never a third time under the lang pattern.
    from rossete_rdf_spark.kgops import kg_bgp_entity_lang

    opt = kg_bgp_entity_lang(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("split(text") == 2


def test_gram_builders_tokenize_once(spark):
    # PROJECTION-BOUNDARY REGRESSION GUARD: CSE does not reach inside
    # higher-order-function lambdas, so a gram builder that passes the
    # words_col(text) expression straight into pos_grams re-runs
    # split+filter once per element_at — n tokenizations per gram
    # (measured 5-12x slowdowns at sf0.1). The optimized plan must contain
    # exactly one split per documents scan.
    from pyspark.sql import functions as F

    from rossete_rdf_spark.textops.dedup import _doc_ngrams, decontaminate
    from rossete_rdf_spark.textops.quality import repetition_scores, winnow_fingerprints

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df, scans in [
        (_doc_ngrams(docs, "doc_id", "text", 3), 1),
        (winnow_fingerprints(docs), 1),
        (repetition_scores(docs), 1),
        (decontaminate(docs), 2),  # eval + train branches scan separately
    ]:
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert opt.count("split(") == scans, f"{scans} expected:\n{opt}"


def test_decontaminate_broadcasts_eval_grams(spark):
    from rossete_rdf_spark.textops.dedup import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(decontaminate(docs))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_funnel_has_no_object_hash_aggregate(spark):
    # the conditional-min shape must stay in whole-stage HashAggregate —
    # never collect_list-per-user (ObjectHashAggregate) or a sort
    from rossete_rdf_spark.relops import events_funnel

    plan = _plan(events_funnel(spark, SF))
    assert "ObjectHashAggregate" not in plan
    assert "collect_list" not in plan


def test_pii_redact_is_pure_projection(spark):
    # regex scrub must fuse into the scan stage: zero exchanges, no Python
    from rossete_rdf_spark.textops.webclean import pii_redact

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(pii_redact(docs))
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_url_dedup_single_hash_agg_shuffle(spark):
    # canonicalization fuses into the scan; the dedup is ONE hashpartitioning
    # exchange with map-side partial aggregation, never a sort
    from rossete_rdf_spark.textops.webclean import url_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(url_dedup(docs))
    tree = plan.split("(1) Scan")[0]  # formatted-mode tree section
    n_shuffles = sum(
        1 for ln in tree.splitlines()
        if "Exchange (" in ln and "BroadcastExchange" not in ln
    )
    assert n_shuffles == 1, tree
    assert "SortAggregate" not in plan
    assert tree.count("HashAggregate (") == 2  # partial + final


def test_anomaly_zscore_broadcasts_stats(spark):
    # the 5-row per-type stats table must come back as a broadcast hash join
    # (one shuffle total), not a second shuffle of the full event scan
    from rossete_rdf_spark.relops import events_anomaly_zscore

    plan = _plan(events_anomaly_zscore(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_not_exists_is_anti_join(spark):
    # SPARQL FILTER NOT EXISTS must lower to a set-oriented anti join
    from rossete_rdf_spark.kgops import kg_not_exists

    plan = _plan(kg_not_exists(spark, SF))
    assert "LeftAnti" in plan


def test_describe_is_semi_join(spark):
    # SPARQL DESCRIBE lowers to a semi join (dedup of seeds by construction)
    from rossete_rdf_spark.kgops import kg_describe_entity

    plan = _plan(kg_describe_entity(spark, SF))
    assert "LeftSemi" in plan


def test_ask_has_early_exit_limit(spark):
    # SPARQL ASK must carry a limit above the semi join so a satisfiable ask
    # can stop at the first match instead of scanning the corpus
    from rossete_rdf_spark.kgops import kg_ask

    plan = _plan(kg_ask(spark, SF))
    assert "Limit" in plan or "CollectLimit" in plan
    assert "LeftSemi" in plan


def test_length_outliers_broadcasts_percentiles(spark):
    # the per-lang percentile table is tiny: it must come back as a
    # broadcast join, never a shuffle of the full doc scan
    from rossete_rdf_spark.textops.quality import length_outliers

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(length_outliers(docs))
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_is_exchange_free(spark):
    # rel_bucketed_join's layout claim: with both sides bucketed+sorted on
    # the join key, the sort-merge join needs NO Exchange on either input —
    # the only shuffle in the whole plan is the final aggregate's. Broadcast
    # is disabled (static + adaptive thresholds) because at fixture scale
    # AQE would otherwise take the broadcast plan and hide the bucketed SMJ
    # this test exists to pin.
    from rossete_rdf_spark.relops import rel_bucketed_join
    from rossete_rdf_spark.session import scoped_conf

    # hold-past-action: AQE can flip SMJ->BHJ at runtime, so the scope stays
    # open across the collect
    with scoped_conf(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }):
        df = rel_bucketed_join(spark, SF)
        # collect() (not count()) so df's OWN AQE plan finalizes
        assert len(df.collect()) > 0
        plan = _plan(df)
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        assert "bj_customer" in final and "bj_orders" in final
        # exactly ONE Exchange (the aggregate's); none feeding the join
        assert final.count("Exchange") == 1


def test_salted_join_matches_plain_join(spark):
    # the salt/replication must be output-invisible: rel_salted_join's
    # aggregate equals the plain (unsalted) hub join's, and the join key
    # carries the salt column so the hub key's rows spread over
    # SALTED_JOIN_REP reducers
    from rossete_rdf_spark.relops import rel_salted_join, rel_skew_join_agg

    salted = {
        r.tag: (r.n_items, r.sum_qty)
        for r in rel_salted_join(spark, SF_SKEW).collect()
    }
    plain = {
        r.tag: (r.n_items, r.sum_qty)
        for r in rel_skew_join_agg(spark, SF_SKEW).collect()
    }
    assert salted == plain
    assert salted["grp0"][0] > 5 * salted["grp1"][0]  # the hub is real


def test_global_sample_is_bounded_heap_not_sort(spark):
    # doc_global_sample's orderBy(qkey).limit(k) must compile to
    # TakeOrderedAndProject (per-task k-heap + driver merge), never a
    # global Sort of the corpus — the KMV plan property applied to rows
    from rossete_rdf_spark.textops.quality import global_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(global_sample(docs))
    assert "TakeOrderedAndProject" in plan
    # "Sort (" is how formatted explain renders a Sort node; a key-pattern
    # like "Sort [qkey" never appears in this format (vacuous assert)
    assert "Sort (" not in plan


def test_pq_encode_is_min_by_agg_not_window(spark):
    # r6: the PQ encode argmin runs as a min_by hash aggregation with
    # map-side partials, not a row_number window — the window shape sorted
    # corpus x PQ_M x PQ_CODES distance rows twice. Exactly ONE window may
    # remain in the whole query: the final per-query top-k.
    from rossete_rdf_spark.textops.ann import ann_pq_adc_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(ann_pq_adc_topk(emb))
    assert plan.count("Window (") == 1  # top-k only; encode argmin is agg


def test_first_occurrence_dedup_single_column_stays_hash_agg(spark):
    # r6: when the only carried column IS the ordering column, the dedup
    # lowers to min() — primitive buffer, whole-stage HashAggregate. The
    # struct-valued min_by general path falls to SortAggregate (declarative
    # aggregate with an immutable buffer), so this fast path is what keeps
    # the 40M-key scaling dedup sort-free. Results must be identical.
    from pyspark.sql import functions as F

    from rossete_rdf_spark.rml.compiler import first_occurrence_dedup

    df = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), (F.col("id") % 7).alias("v")
    )
    fast = first_occurrence_dedup(df, ["k"], order_col="v")
    plan = _plan(fast)
    assert "SortAggregate" not in plan and "ObjectHashAggregate" not in plan
    assert "HashAggregate" in plan
    # same rows as the general struct path on an extra carried column
    general = first_occurrence_dedup(
        df.withColumn("w", F.col("v") * 10), ["k"], order_col="v"
    ).select("k", "v")
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, general.collect())
    )


def test_rdfs_closure_matches_spark_fixpoint(spark):
    # r6: the TBox closure moved from iterated Spark joins to a driver-side
    # Python fixpoint (the edge list is static and schema-sized). Pin its
    # output against an independent Spark-side fixpoint so a closure bug
    # can never hide behind the faster path.
    from pyspark.sql import functions as F

    from rossete_rdf_spark.kgops import _tbox_edges

    edges = spark.createDataFrame(_tbox_edges(), "sub string, super string")
    closure = edges
    while True:
        grown = (
            closure.alias("p")
            .join(edges.alias("e"), F.col("p.super") == F.col("e.sub"))
            .select(F.col("p.sub").alias("sub"), F.col("e.super").alias("super"))
            .unionByName(closure)
            .distinct()
            .localCheckpoint(eager=True)
        )
        if grown.count() == closure.count():
            break
        closure = grown
    expected = {(r.sub, r.super) for r in closure.collect()}

    direct = _tbox_edges()
    closed = set(direct)
    while True:
        new = {
            (a, d) for (a, b) in closed for (c, d) in direct if b == c
        } - closed
        if not new:
            break
        closed |= new
    assert closed == expected
