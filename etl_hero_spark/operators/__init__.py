"""Operator namespace — profile / detect / clean / score / dedup plus the
scale extensions, re-exported from their implementation modules.

The flat modules (etl_hero_spark.profile, .detect, .clean, ...) are the
implementation units keyed to SURVEY.md §2 operator IDs; this package
presents them as one operator surface.
"""

from etl_hero_spark.clean import (  # noqa: F401
    clip_outliers,
    clip_outliers_grouped,
    drop_duplicate_rows,
    drop_null_rows,
    force_date_format,
    impute,
    impute_grouped,
    normalize_dates,
    remove_outliers,
    remove_outliers_iqr,
    replace_outliers,
    replace_where,
)
from etl_hero_spark.dedup import (  # noqa: F401
    dedup_exact_content,
    flag_benchmark_contamination_fuzzy,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
)
from etl_hero_spark.contracts import (  # noqa: F401
    accepted_values,
    in_range,
    matches,
    not_null,
    validate_contract,
)
from etl_hero_spark.detect import (  # noqa: F401
    date_likeness,
    detect_anomalies_mad,
    detect_duplicates,
    detect_missing,
    detect_missions,
    detect_outliers,
    detect_outliers_iqr,
    iqr_bounds,
    with_outlier_flags,
    zscore_stats,
)
from etl_hero_spark.multimodal import (  # noqa: F401
    decode_media_stub,
    resize_media_stub,
    sample_frames,
    validate_media,
    wav_metadata,
    with_media_column,
)
from etl_hero_spark.profile import (  # noqa: F401
    benford_profile,
    correlation_matrix,
    distinct_counts,
    histogram2d,
    distinct_sketch,
    estimate_distincts,
    merge_distinct_sketches,
    merge_quantile_sketches,
    quantile_sketch,
    quantiles_from_sketch,
    finalize_stats,
    merge_stats_snapshots,
    stats_snapshot,
    duplicate_count,
    mode_value,
    null_counts,
    numeric_stats,
    profile_table,
    quantiles,
    sample_values,
)
from etl_hero_spark.pii import (  # noqa: F401
    redact_credit_cards,
    with_credit_card_flags,
)
from etl_hero_spark.score import (  # noqa: F401
    head_sample,
    insights,
    quality_score,
)
from etl_hero_spark.sampling import (  # noqa: F401
    mix_sources_budget,
    with_split,
    stratified_sample_exact,
    stratified_sample_fraction,
    weighted_hash_sample,
)
from etl_hero_spark.simsearch import (  # noqa: F401
    embedding_near_dup_pairs,
    semantic_dedup,
    topk_cosine,
    topk_cosine_ivf,
    topk_cosine_pq,
    topk_cosine_ivfpq_indexed,
    write_ivfpq_index,
    topk_cosine_lsh,
)
from etl_hero_spark.skew import (  # noqa: F401
    ensure_min_partitions,
    guarded_join,
    salted_join,
    two_phase_distinct_count,
)
from etl_hero_spark.temporal import (  # noqa: F401
    asof_join,
    interval_overlap_join,
    range_join_count,
    resample_forward_fill,
    rolling_features,
)
from etl_hero_spark.textops import (  # noqa: F401
    chunk_documents,
    with_clean_text,
    dedup_lines_within_doc,
    global_line_dedup,
    gopher_filter,
    bigram_logprob_score,
    bigram_vocab,
    score_with_bigram_vocab,
    score_with_unigram_vocab,
    tfidf_top_terms,
    unigram_logprob_score,
    unigram_vocab,
    with_c4_line_filter,
    with_fingerprints,
    with_gopher_quality,
    with_lang_id,
    with_quality_signals,
    with_token_counts,
)
from etl_hero_spark.cdc import (  # noqa: F401
    merge_upsert,
    scd2_apply,
    schema_diff,
    scd2_history,
    snapshot_diff,
)
from etl_hero_spark.er import (  # noqa: F401
    fuzzy_pairs_multi,
    phonetic_block_key_expr,
    resolve_entities,
    resolve_entities_incremental,
)
from etl_hero_spark.layout import (  # noqa: F401
    compact_files,
    file_stats,
    optimize_table,
    zorder_write,
)
from etl_hero_spark.sampling import (  # noqa: F401
    mix_sources_temperature,
    temperature_weights,
)

# round-4 additions
from etl_hero_spark.cdc import (  # noqa: F401
    erasure_audit,
    propagate_erasure,
    refresh_join_fact_delta,
)
from etl_hero_spark.contracts import (  # noqa: F401
    quarantine_split,
    referential_integrity,
    with_violations,
)
from etl_hero_spark.detect import seasonal_anomaly_buckets  # noqa: F401
from etl_hero_spark.er import trigram_block_pairs  # noqa: F401
from etl_hero_spark.layout import (  # noqa: F401
    overwrite_audit,
    overwrite_changed_partitions,
    partition_file_index,
    write_bucketed_table,
    write_partitioned,
)
from etl_hero_spark.packing import (  # noqa: F401
    pack_sequences,
    pack_token_shards,
    sequence_manifest,
    shard_manifest,
)
from etl_hero_spark.profile import (  # noqa: F401
    countmin_sketch,
    estimate_counts,
    merge_countmin_sketches,
)
from etl_hero_spark.sampling import reservoir_per_key  # noqa: F401
from etl_hero_spark.simsearch import (  # noqa: F401
    cluster_sizes_lloyd,
    diverse_sample_by_cluster,
    kmeans_init,
    kmeans_lloyd,
)
from etl_hero_spark.temporal import point_in_time_join  # noqa: F401
from etl_hero_spark.textops import bm25_top_terms  # noqa: F401
from etl_hero_spark.cdc import (  # noqa: F401
    agg_partials,
    retractable_agg_refresh,
)
from etl_hero_spark.multimodal import png_metadata  # noqa: F401
from etl_hero_spark.profile import json_schema_profile  # noqa: F401
from etl_hero_spark.skew import key_skew_report  # noqa: F401
from etl_hero_spark.textops import (  # noqa: F401
    bpe_token_counts,
    train_bpe,
    word_counts,
)
from etl_hero_spark.analytics import (  # noqa: F401
    copurchase_pairs,
    transition_matrix,
)
from etl_hero_spark.layout import parquet_column_audit  # noqa: F401
from etl_hero_spark.versioning import (  # noqa: F401
    commit_version,
    read_version,
    vacuum,
)
from etl_hero_spark.versioning import (  # noqa: F401
    commit_merge,
    commit_version_if,
)
from etl_hero_spark.analytics import pagerank  # noqa: F401
from etl_hero_spark.analytics import (  # noqa: F401
    funnel_latency,
    target_encode_oof,
)
from etl_hero_spark.profile import mutual_information  # noqa: F401

# round-5 additions
from etl_hero_spark.dedup import dedup_keep_best, keep_best_ids  # noqa: F401
from etl_hero_spark.dsir import dsir_log_weights, dsir_resample  # noqa: F401
from etl_hero_spark.features import (  # noqa: F401
    isotonic_apply,
    isotonic_calibration,
)
from etl_hero_spark.multimodal import jpeg_metadata, mp4_metadata  # noqa: F401
from etl_hero_spark.simsearch import rank_bounded, rrf_fuse  # noqa: F401
from etl_hero_spark.stattests import weighted_quantile  # noqa: F401
from etl_hero_spark.temporal import resample_interpolate  # noqa: F401
from etl_hero_spark.textops import bm25_query_scores  # noqa: F401
