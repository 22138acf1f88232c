from bigdata_etl_customer360_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    redact_pii,
)
from bigdata_etl_customer360_spark.operators.dedup import (
    dedup_exact,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_shingles,
    with_simhash,
)
from bigdata_etl_customer360_spark.operators.graph import (
    connected_components,
    keep_cluster_canonical,
)
from bigdata_etl_customer360_spark.operators.enrich import (
    BatchPromptClassifier,
    RuleClassifier,
    classify_column,
)
from bigdata_etl_customer360_spark.operators.multimodal import (
    binarize_text,
    extract_features,
    extract_frames,
    frame_sample,
    repartition_for_payloads,
)
from bigdata_etl_customer360_spark.operators.relational import (
    bucketize,
    map_dimension,
    map_dimension_join,
    merge_upsert,
    multi_agg,
    pivot_agg,
    salted_join,
    top_k_per_group,
    trend_compare,
    union_by_name,
)
from bigdata_etl_customer360_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from bigdata_etl_customer360_spark.operators.textstats import (
    filter_corpus,
    with_fingerprint,
    with_hash_split,
    with_lang_id,
    with_quality_score,
    with_token_count,
    with_token_count_bpe,
)
from bigdata_etl_customer360_spark.operators.util import (
    cache_scope,
    fan_out,
    let1,
    scoped_cache,
)

__all__ = [
    "BatchPromptClassifier",
    "filter_corpus",
    "RuleClassifier",
    "binarize_text",
    "bucketize",
    "cache_scope",
    "classify_column",
    "connected_components",
    "cosine_topk_brute",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "decontaminate",
    "dedup_exact",
    "embedding_cosine_pairs",
    "extract_features",
    "extract_frames",
    "fan_out",
    "frame_sample",
    "keep_cluster_canonical",
    "let1",
    "map_dimension",
    "map_dimension_join",
    "merge_upsert",
    "minhash_lsh_pairs",
    "multi_agg",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "pivot_agg",
    "redact_pii",
    "repartition_for_payloads",
    "salted_join",
    "scoped_cache",
    "simhash_pairs",
    "top_k_per_group",
    "trend_compare",
    "union_by_name",
    "with_fingerprint",
    "with_hash_split",
    "with_lang_id",
    "with_quality_score",
    "with_shingles",
    "with_simhash",
    "with_token_count",
    "with_token_count_bpe",
]
