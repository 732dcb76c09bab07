from .ann import (  # noqa: F401
    ann_cosine_topk,
    ann_pq_adc_topk,
    ann_pq_rerank_topk,
    ann_sq8_topk,
    ann_ivf_kmeans_topk,
    ann_ivf_nprobe_topk,
    ann_ivf_topk,
    ann_lsh_bucket_topk,
    embedding_neardup_pairs,
)
from .dedup import (  # noqa: F401
    decontaminate,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_neardup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    span_dedup,
)
from .sketches import (  # noqa: F401
    heavy_hitters_cms,
    sketch_distinct_hll,
    sketch_distinct_kmv,
)
from .webclean import (  # noqa: F401
    domain_blocklist,
    pii_redact,
    url_dedup,
)
from .quality import (  # noqa: F401
    clean_corpus,
    domain_quota,
    global_sample,
    doc_fingerprint,
    lang_id,
    length_outliers,
    quality_score,
    repetition_scores,
    source_stats,
    stratified_sample,
    tfidf_top_terms,
    token_count,
    train_test_split,
    unigram_logprob,
    vocab_dense_ids,
    winnow_fingerprints,
)
