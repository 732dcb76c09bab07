"""Registry of driver-contract queries: name -> (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle for each (oracles.py). This is the single source of
truth consumed by __spark_entry__.py, the cross-check tests, and bench.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import kgops, relops, rmlops
from .graph.analytics import (
    bfs_reachability,
    comention_pmi,
    entity_pagerank,
    entity_triangles,
    label_propagation,
)
from .oracles import ORACLES
from .pipeline.multimodal import multimodal_features_query
from .pipeline.canonicalize import entity_canonical_query
from .pipeline.pagedup import page_canonical_exact_query, page_canonical_lsh_query
from .streaming.events import (
    streaming_dedup_query,
    streaming_hourly_agg_query,
    streaming_interval_join_query,
    streaming_sessionize_query,
    streaming_static_join_query,
)
from .textops import (
    ann_cosine_topk,
    ann_pq_adc_topk,
    ann_pq_rerank_topk,
    ann_sq8_topk,
    domain_blocklist,
    domain_quota,
    global_sample,
    heavy_hitters_cms,
    sketch_distinct_hll,
    sketch_distinct_kmv,
    clean_corpus,
    decontaminate,
    ann_ivf_kmeans_topk,
    ann_ivf_nprobe_topk,
    ann_ivf_topk,
    ann_lsh_bucket_topk,
    doc_fingerprint,
    embedding_neardup_pairs,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_neardup,
    lang_id,
    length_outliers,
    minhash_lsh_pairs,
    pii_redact,
    url_dedup,
    ngram_jaccard_pairs,
    quality_score,
    repetition_scores,
    simhash,
    source_stats,
    span_dedup,
    stratified_sample,
    tfidf_top_terms,
    token_count,
    train_test_split,
    vocab_dense_ids,
    unigram_logprob,
    winnow_fingerprints,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _docs_op(fn) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    return run


def _emb_op(fn) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))

    return run


QUERIES: dict[str, QueryFn] = {
    # training-data ops: dedup family
    "exact_dedup": _docs_op(exact_dedup),
    "incremental_exact_dedup": _docs_op(incremental_exact_dedup),
    "incremental_minhash_neardup": _docs_op(incremental_minhash_neardup),
    "doc_fingerprint": _docs_op(doc_fingerprint),
    "doc_winnow_fingerprint": _docs_op(winnow_fingerprints),
    "ngram_jaccard_pairs": _docs_op(ngram_jaccard_pairs),
    "minhash_lsh_pairs": _docs_op(minhash_lsh_pairs),
    "simhash": _docs_op(simhash),
    "doc_span_dedup": _docs_op(span_dedup),
    # text analysis
    "token_count": _docs_op(token_count),
    "lang_id": _docs_op(lang_id),
    "quality_score": _docs_op(quality_score),
    "doc_repetition_score": _docs_op(repetition_scores),
    "doc_train_test_split": _docs_op(train_test_split),
    "doc_stratified_sample": _docs_op(stratified_sample),
    "doc_domain_quota": _docs_op(domain_quota),
    "doc_global_sample": _docs_op(global_sample),
    "doc_length_outliers": _docs_op(length_outliers),
    "doc_source_stats": _docs_op(source_stats),
    "doc_clean_corpus": _docs_op(clean_corpus),
    "doc_tfidf_top_terms": _docs_op(tfidf_top_terms),
    "doc_unigram_logprob": _docs_op(unigram_logprob),
    "vocab_dense_ids": _docs_op(vocab_dense_ids),
    "doc_decontaminate": _docs_op(decontaminate),
    # web-corpus cleaning (URL canonicalization + PII scrub)
    "doc_url_dedup": _docs_op(url_dedup),
    "doc_pii_redact": _docs_op(pii_redact),
    "doc_domain_blocklist": _docs_op(domain_blocklist),
    # fixed-memory sketches (KMV/HLL distinct estimates, count-min heavy hitters)
    "sketch_distinct_kmv": _docs_op(sketch_distinct_kmv),
    "sketch_distinct_hll": _docs_op(sketch_distinct_hll),
    "heavy_hitters_cms": _docs_op(heavy_hitters_cms),
    # similarity search + embedding-tier dedup
    "ann_cosine_topk": _emb_op(ann_cosine_topk),
    "ann_lsh_bucket_topk": _emb_op(ann_lsh_bucket_topk),
    "ann_ivf_topk": _emb_op(ann_ivf_topk),
    "ann_ivf_nprobe_topk": _emb_op(ann_ivf_nprobe_topk),
    "ann_ivf_kmeans_topk": _emb_op(ann_ivf_kmeans_topk),
    "ann_sq8_topk": _emb_op(ann_sq8_topk),
    "ann_pq_adc_topk": _emb_op(ann_pq_adc_topk),
    "ann_pq_rerank_topk": _emb_op(ann_pq_rerank_topk),
    "embedding_neardup_pairs": _emb_op(embedding_neardup_pairs),
    # KG construction (batch face)
    "kg_mentions": kgops.kg_mentions,
    "kg_entity_link": kgops.kg_entity_link,
    "kg_doc_triples": kgops.kg_doc_triples,
    # KG consumption + maintenance over the materialised triple table
    "kg_predicate_stats": kgops.kg_predicate_stats,
    "kg_bgp_entity_lang": kgops.kg_bgp_entity_lang,
    "kg_triples_delta": kgops.kg_triples_delta,
    "kg_apply_delta": kgops.kg_apply_delta,
    # SPARQL algebra over the triple table (OPTIONAL / NOT EXISTS / DESCRIBE)
    "kg_optional_mentions": kgops.kg_optional_mentions,
    "kg_not_exists": kgops.kg_not_exists,
    "kg_describe_entity": kgops.kg_describe_entity,
    "kg_ask": kgops.kg_ask,
    "kg_construct_popular": kgops.kg_construct_popular,
    "kg_group_concat_langs": kgops.kg_group_concat_langs,
    # RDFS forward chaining + SHACL-style snapshot validation
    "kg_rdfs_inference": kgops.kg_rdfs_inference,
    "kg_shacl_validate": kgops.kg_shacl_validate,
    # entity canonicalization (LSH blocking -> Jaccard verify -> CC), oracled
    "kg_entity_canonical": entity_canonical_query,
    # entity-graph analytics over the co-mention graph
    "kg_entity_pagerank": _docs_op(entity_pagerank),
    "kg_entity_triangles": _docs_op(entity_triangles),
    "kg_comention_pmi": _docs_op(comention_pmi),
    "kg_label_propagation": _docs_op(label_propagation),
    "kg_bfs_reachability": _docs_op(bfs_reachability),
    # relational / streaming-batch twins
    "rel_first_match_join": relops.rel_first_match_join,
    "rel_runtime_filter_join": relops.rel_runtime_filter_join,
    "rel_skew_join_agg": relops.rel_skew_join_agg,
    "rel_salted_join": relops.rel_salted_join,
    "rel_bucketed_join": relops.rel_bucketed_join,
    "events_asof_join": relops.events_asof_join,
    "events_asof_join_bucketed": relops.events_asof_join_bucketed,
    "events_range_join": relops.events_range_join,
    "events_moving_avg": relops.events_moving_avg,
    "events_funnel": relops.events_funnel,
    "events_retention_cohorts": relops.events_retention_cohorts,
    "events_top_spenders": relops.events_top_spenders,
    "events_top_spenders_salted": relops.events_top_spenders_salted,
    "events_value_quantiles": relops.events_value_quantiles,
    "events_value_histogram": relops.events_value_histogram,
    "events_anomaly_zscore": relops.events_anomaly_zscore,
    "mention_counts_salted": relops.mention_counts_salted,
    "events_rollup": relops.events_rollup,
    "events_cube": relops.events_cube,
    "events_pivot": relops.events_pivot,
    "events_unpivot_roundtrip": relops.events_unpivot_roundtrip,
    "events_hourly_agg": relops.events_hourly_agg,
    "events_hopping_agg": relops.events_hopping_agg,
    "events_sessionize": relops.events_sessionize,
    "tpch_q1_pricing": relops.tpch_q1_pricing,
    "tpch_q3_shipping": relops.tpch_q3_shipping,
    "tpch_q5_local_volume": relops.tpch_q5_local_volume,
    # structured streaming (real readStream -> watermark -> memory sink)
    "streaming_hourly_agg": streaming_hourly_agg_query,
    "streaming_dedup": streaming_dedup_query,
    "streaming_interval_join": streaming_interval_join_query,
    "streaming_static_join": streaming_static_join_query,
    "streaming_sessionize": streaming_sessionize_query,
    # multimodal binary-column plumbing (mapInPandas feature extraction)
    "multimodal_features": multimodal_features_query,
    # page-dedup tiers through real iterative connected components
    "page_canonical_exact": page_canonical_exact_query,
    "page_canonical_lsh": page_canonical_lsh_query,
    # RML engine end-to-end
    "rml_nation_region_graph": rmlops.rml_nation_region_graph,
    "rml_subject_space_discard": rmlops.rml_subject_space_discard,
    "rml_self_join": rmlops.rml_self_join,
    "rml_constant_terms": rmlops.rml_constant_terms,
    # RML sources (S1 CSV / S2 JSON-iterator) and writers (W1 NT / W2 TTL)
    "rml_csv_source": rmlops.rml_csv_source,
    "rml_json_iterator": rmlops.rml_json_iterator,
    "nt_serialization": rmlops.nt_serialization,
    "ttl_serialization": rmlops.ttl_serialization,
    # rr:graphMap -> quad table graph column
    "rml_graph_quads": rmlops.rml_graph_quads,
}


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if k in QUERIES}
