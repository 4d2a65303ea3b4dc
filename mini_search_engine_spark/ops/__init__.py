"""Training-data pipeline operators: dedup, similarity search, text stats,
multimodal plumbing. All engine-side logic is native Catalyst or Arrow UDFs;
hash functions are md5-prefix based so a DuckDB oracle can replicate them
bit-for-bit."""

from mini_search_engine_spark.ops.dedup import (
    decontaminate,
    duplicate_spans,
    exact_dedup,
    minhash_signatures,
    minhash_candidate_pairs,
    remove_duplicate_spans,
    simhash,
    ngram_jaccard_pairs,
)
from mini_search_engine_spark.ops.incremental import (
    append_exact_store,
    compact_exact_store,
    compact_minhash_store,
    append_minhash_store,
    incremental_exact_flags,
    incremental_minhash_flags,
    read_exact_store,
    read_minhash_store,
    write_exact_store,
    write_minhash_store,
)
from mini_search_engine_spark.ops.ann import (
    append_ivf_index,
    cosine_pairs,
    cosine_topk,
    mmr_rerank,
    ivf_assign,
    ivf_cosine_topk,
    ivf_fit_centroids,
    ivf_fit_centroids_distributed,
    lsh_cosine_pairs,
    lsh_cosine_topk,
    read_ivf_index,
    write_ivf_index,
)
from mini_search_engine_spark.ops.classify import (
    NBModel,
    nb_classify,
    nb_score,
    nb_train,
)
from mini_search_engine_spark.ops.curate import (
    curate,
    curation_funnel,
)
from mini_search_engine_spark.ops.domains import (
    source_filter,
    source_stats,
)
from mini_search_engine_spark.ops.dsir import (
    dsir_log_weights,
    dsir_select,
)
from mini_search_engine_spark.ops.lm import (
    lm_perplexity,
    lm_train_bigram,
    perplexity_buckets,
)
from mini_search_engine_spark.ops.ivfadc import (
    ivf_train_centroids,
    ivfadc_encode,
    ivfadc_topk,
    seeded_centroids,
)
from mini_search_engine_spark.ops.pq import (
    adc_lut,
    pq_adc_topk,
    pq_encode,
    pq_train,
    seeded_codebooks,
)
from mini_search_engine_spark.ops.cluster import (
    connected_components,
    dedup_clusters,
    dedup_keep_canonical,
)
from mini_search_engine_spark.ops.chunk import (
    chunk_documents,
    pack_sequences,
)
from mini_search_engine_spark.ops.pipeline import (
    epoch_mix,
    hash_sample,
    pii_redact,
    repetition_scores,
    stratified_hash_sample,
)
from mini_search_engine_spark.ops.asof import asof_join
from mini_search_engine_spark.ops.sessions import session_stats, sessionize
from mini_search_engine_spark.ops.symbols import (
    extract_imports,
    extract_symbols,
    import_edges,
    symbol_field,
    symbol_search,
)
from mini_search_engine_spark.ops.textstats import (
    collocations,
    frequent_ngrams,
    next_words,
    language_id,
    quality_scores,
    token_counts,
    fingerprints,
    fingerprints_rolling,
)
from mini_search_engine_spark.ops.vectors import doc_vectors
from mini_search_engine_spark.ops.bpe import (
    bpe_token_counts,
    encode_bpe,
    train_bpe,
    train_bpe_corpus,
)
from mini_search_engine_spark.ops.multimodal import (
    decode_ppm,
    decode_wav,
    extract_features,
    resize_images,
    sample_frames,
    stdlib_decoder,
    synthesize_media,
    synthesize_real_media,
)

__all__ = [
    "asof_join",
    "extract_imports",
    "sessionize",
    "session_stats",
    "extract_symbols",
    "import_edges",
    "symbol_field",
    "symbol_search",
    "decontaminate",
    "duplicate_spans",
    "exact_dedup",
    "append_exact_store",
    "compact_exact_store",
    "compact_minhash_store",
    "append_minhash_store",
    "incremental_exact_flags",
    "incremental_minhash_flags",
    "read_exact_store",
    "read_minhash_store",
    "write_exact_store",
    "write_minhash_store",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "remove_duplicate_spans",
    "simhash",
    "ngram_jaccard_pairs",
    "cosine_pairs",
    "cosine_topk",
    "mmr_rerank",
    "ivf_assign",
    "ivf_cosine_topk",
    "ivf_fit_centroids",
    "ivf_fit_centroids_distributed",
    "read_ivf_index",
    "write_ivf_index",
    "append_ivf_index",
    "lsh_cosine_pairs",
    "lsh_cosine_topk",
    "dsir_log_weights",
    "dsir_select",
    "lm_perplexity",
    "lm_train_bigram",
    "perplexity_buckets",
    "adc_lut",
    "curate",
    "curation_funnel",
    "ivf_train_centroids",
    "ivfadc_encode",
    "ivfadc_topk",
    "pq_adc_topk",
    "pq_encode",
    "pq_train",
    "seeded_centroids",
    "seeded_codebooks",
    "source_filter",
    "source_stats",
    "NBModel",
    "nb_classify",
    "nb_score",
    "nb_train",
    "connected_components",
    "dedup_clusters",
    "dedup_keep_canonical",
    "chunk_documents",
    "pack_sequences",
    "hash_sample",
    "pii_redact",
    "repetition_scores",
    "stratified_hash_sample",
    "epoch_mix",
    "language_id",
    "collocations",
    "frequent_ngrams",
    "next_words",
    "doc_vectors",
    "quality_scores",
    "token_counts",
    "fingerprints",
    "fingerprints_rolling",
    "bpe_token_counts",
    "encode_bpe",
    "train_bpe",
    "train_bpe_corpus",
    "decode_ppm",
    "decode_wav",
    "extract_features",
    "resize_images",
    "sample_frames",
    "stdlib_decoder",
    "synthesize_media",
    "synthesize_real_media",
]
