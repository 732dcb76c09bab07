"""Semantic property tests for the beyond-reference operators (the oracle
cross-checks pin exact values; these pin the CLAIMED guarantees)."""

from pyspark.sql import functions as F

from rossete_rdf_spark.relops import asof_join
from rossete_rdf_spark.textops.quality import WINNOW_K, WINNOW_W, winnow_fingerprints


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al.: two docs sharing a run of >= k+w-1 words MUST share
    at least one selected fingerprint."""
    shared = " ".join(f"common{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee " + shared + " ff gg hh ii jj"),
            (2, "zz yy xx ww vv uu " + shared + " tt ss rr qq pp"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs).collect()
    s1 = {r.fp for r in fps if r.doc_id == 1}
    s2 = {r.fp for r in fps if r.doc_id == 2}
    assert s1 & s2, "shared k+w-1 run must produce a shared fingerprint"


def test_winnowing_short_doc_yields_nothing(spark):
    # includes docs shorter than K words and an empty doc: sequence(1, 0)
    # DESCENDS in Spark, so an unguarded gram index crashes element_at here
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(WINNOW_K + WINNOW_W - 2))),
            (2, "just two"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    assert winnow_fingerprints(docs).count() == 0


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, 1000), (1, 101, 2000), (2, 102, 500)],
        ["user_id", "event_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, 7, 900), (1, 8, 1000), (1, 9, 1500), (2, 10, 600)],
        ["user_id", "event_id", "ts"],
    )
    rows = {
        r.event_id: (r.right_event_id, r.right_ts)
        for r in asof_join(left, right, on="user_id").collect()
    }
    # left@1000: right@1000 (inclusive <=, beats 900); left@2000: right@1500
    assert rows[100] == (8, 1000)
    assert rows[101] == (9, 1500)
    # user 2's only right row is AFTER the left row -> inner semantics drop it
    assert 102 not in rows


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, 100, 2000)], ["user_id", "event_id", "ts"])
    right = spark.createDataFrame([(1, 7, 500)], ["user_id", "event_id", "ts"])
    assert asof_join(left, right, on="user_id").count() == 1
    assert (
        asof_join(left, right, on="user_id", tolerance_sec=1000).count() == 0
    )


def test_asof_join_bucketed_matches_asof_join(spark):
    """The hub-safe bucketed formulation must be output-equivalent to the
    per-key-history asof_join — across tolerances and bucket widths (one
    event per bucket, a handful of buckets, one bucket spanning everything)."""
    from rossete_rdf_spark.relops import asof_join, asof_join_bucketed

    # key 0 is mapped to NULL: the hub-key-safe variant's prime use case is
    # the null-ish default key, so NULL keys must carry across buckets too
    key = F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.col("id") % 7)
    left = spark.range(200).select(
        key.alias("user_id"),
        F.col("id").alias("event_id"),
        ((F.col("id") * 37) % 1000 * 10).alias("ts"),
    )
    right = spark.range(300).select(
        key.alias("user_id"),
        (F.col("id") + 1000).alias("event_id"),
        ((F.col("id") * 53) % 997 * 10).alias("ts"),
    )
    def norm(df):
        rows = [tuple(r) for r in df.collect()]
        return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))

    for tol in (None, 900):
        base = norm(asof_join(left, right, on="user_id", tolerance_sec=tol))
        assert base
        assert any(t[0] is None for t in base), "NULL-key matches must exist"
        for bucket_sec in (1, 500, 10**9):
            got = norm(
                asof_join_bucketed(
                    left, right, on="user_id", tolerance_sec=tol, bucket_sec=bucket_sec
                )
            )
            assert got == base, (tol, bucket_sec)


def test_dictionary_encode_nodes_is_rank(spark):
    """Encoded ids must be the dense rank of the node under its natural
    ordering — order preservation is what lets min-label components decode
    to the min node."""
    from rossete_rdf_spark.graph.cc import dictionary_encode_nodes

    edges = spark.range(100).select(
        F.concat(F.lit("u"), ((F.col("id") * 13) % 57).cast("string")).alias("src"),
        F.concat(F.lit("u"), ((F.col("id") * 7) % 41).cast("string")).alias("dst"),
    )
    d = {r.node: r.nid for r in dictionary_encode_nodes(edges).collect()}
    assert d == {n: i for i, n in enumerate(sorted(d))}


def test_connected_components_encoded_matches_string_cc(spark):
    """The dictionary-encoded 10^12-node path must be output-identical to
    the string-keyed loop — across graph shapes: chains (worst-case round
    count), stars, random unions, singleton edges, and the pagedup exact
    duplicate graph."""
    from rossete_rdf_spark.graph.cc import (
        connected_components,
        connected_components_encoded,
    )
    from rossete_rdf_spark.pipeline.pagedup import exact_duplicate_edges

    def norm(df):
        return sorted((r.node, r.component) for r in df.collect())

    u = lambda i: F.concat(F.lit("u"), i.cast("string"))  # noqa: E731
    graphs = [
        # chain u0-u1-...-u29: one component, max star rounds
        spark.range(29).select(u(F.col("id")).alias("src"), u(F.col("id") + 1).alias("dst")),
        # 5 stars of 40 leaves each
        spark.range(200).select(
            u(F.col("id") % 5).alias("src"), u(F.col("id") + 10).alias("dst")
        ),
        # pseudo-random unions (dense mixing, several components)
        spark.range(400).select(
            u((F.col("id") * 37) % 97).alias("src"),
            u((F.col("id") * 53) % 89).alias("dst"),
        ),
    ]
    pages = spark.range(60).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("text "), (F.col("id") % 13).cast("string")).alias("text"),
    )
    graphs.append(exact_duplicate_edges(pages))
    for i, g in enumerate(graphs):
        base = norm(connected_components(g))
        assert base, f"graph {i} produced no components"
        assert norm(connected_components_encoded(g)) == base, f"graph {i}"


def test_salted_top_k_matches_unsalted(spark):
    from rossete_rdf_spark.relops import salted_top_k_per_group, top_k_per_group

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("item"),
        # unique order values (ties make the winner SET ambiguous for both)
        ((F.col("id") * 37) % 3001).alias("score"),
    )
    plain = {
        (r.g, r.item, r.score, r.rk)
        for r in top_k_per_group(df, ["g"], "score", 5).collect()
    }
    salted = {
        (r.g, r.item, r.score, r.rk)
        for r in salted_top_k_per_group(df, ["g"], "score", 5, n_salts=8).collect()
    }
    assert plain == salted and len(plain) == 15


def test_salted_top_k_heavy_ties_spread_and_valid(spark):
    """The hub pattern salting exists for: thousands of rows in one group
    tied on the order value. The row-distinct salt must (a) actually spread
    the tied rows over the slices and (b) still return a valid top-k —
    winners among boundary-tied rows are arbitrary in ANY top-k, but the
    score multiset is not."""
    from rossete_rdf_spark.relops import (
        _row_salt,
        salted_top_k_per_group,
        top_k_per_group,
    )

    n_salts = 8
    df = spark.range(6000).select(
        F.lit(0).alias("g"),
        F.col("id").alias("item"),
        (F.col("id") % 3).alias("score"),  # 3 distinct values, 2000 rows each
    )
    used = df.withColumn("s", _row_salt(df, n_salts)).select("s").distinct().count()
    assert used == n_salts, "tied order values must not collapse the salt"
    plain = sorted(r.score for r in top_k_per_group(df, ["g"], "score", 5).collect())
    salted = sorted(
        r.score
        for r in salted_top_k_per_group(df, ["g"], "score", 5, n_salts=n_salts).collect()
    )
    assert plain == salted == [2, 2, 2, 2, 2]


def test_asof_join_tolerance_on_real_timestamp_columns(spark):
    """Regression: events.parquet loads ts as TIMESTAMP_NTZ, which cannot
    cast straight to BIGINT — the tolerance filter must take the
    timestamp-first double cast on both as-of variants."""
    from rossete_rdf_spark.relops import asof_join, asof_join_bucketed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    base = asof_join(left, right, on="user_id", tolerance_sec=3600)
    bucketed = asof_join_bucketed(
        left, right, on="user_id", tolerance_sec=3600, bucket_sec=86400
    )
    n_base, n_bucketed = base.count(), bucketed.count()
    assert n_base == n_bucketed
    # tolerance must actually filter relative to the untolerated join
    assert n_base < asof_join(left, right, on="user_id").count()


def test_entity_pagerank_empty_graph_returns_empty(spark):
    """Regression: a corpus whose gazetteer yields no co-mention edges must
    return an empty (entity, wdeg, rank) frame, not ZeroDivisionError."""
    from rossete_rdf_spark.graph.analytics import entity_pagerank

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    out = entity_pagerank(docs)
    assert out.columns == ["entity", "wdeg", "rank"]
    assert out.count() == 0


def test_repetition_scores_hand_computed(spark):
    """Edge cases the synthetic corpus (all docs >= 10 words) never hits:
    empty text, 1-2 word docs (no bigrams/trigrams), plus hand-computed
    fractions for a templated and a fully-repeated doc."""
    from rossete_rdf_spark.textops.quality import repetition_scores

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "a"),
            (2, "a a"),
            (3, "a b a b a b"),
            (4, "x x x"),
            (5, None),  # NULL text counts as empty (size(NULL) would be -1)
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (
            r.n_words,
            r.dup_word_frac,
            r.top_bigram_frac,
            r.dup_trigram_frac,
        )
        for r in repetition_scores(docs).collect()
    }
    assert got[0] == (0, 0.0, 0.0, 0.0)
    assert got[1] == (1, 0.0, 0.0, 0.0)
    assert got[2] == (2, 0.5, 1.0, 0.0)
    # "a b a b a b": 5 bigram positions, "a b" x3 -> 0.6; all 4 trigram
    # positions are one of two trigrams that each occur twice -> 1.0
    assert got[3] == (6, 0.666667, 0.6, 1.0)
    # "x x x": one trigram occurring once -> singleton -> 0.0
    assert got[4] == (3, 0.666667, 1.0, 0.0)
    assert got[5] == (0, 0.0, 0.0, 0.0)


def test_dense_ids_are_gapfree_and_order_preserving(spark):
    # dense_ids must equal a global row_number over the distinct sorted
    # values — gap-free 0..n-1, order-preserving — regardless of input
    # partitioning or duplication, with more distinct values than range
    # partitions so the offset arithmetic actually composes across
    # partitions
    from rossete_rdf_spark.graph.cc import dense_ids

    vals = [f"tok{i:04d}" for i in range(500)]
    # duplicated + shuffled input across an awkward partition count
    df = spark.createDataFrame(
        [(v,) for v in vals * 3][::-1], ["token"]
    ).repartition(7)
    got = {r.token: r.nid for r in dense_ids(df, "token").collect()}
    assert got == {v: i for i, v in enumerate(sorted(vals))}
