"""Parallelism-invariance of the gate surface: the SAME query must
produce the SAME rows at different shuffle widths — the determinism
a 1000-executor cluster run needs (task count must never leak into
results via float summation order unrounded, window framing, hash
sampling, or prefix-sum partitioning).

Representative gates across the engine's shapes: aggregation, window
ranking, LSH dedup, deterministic sampling, the distributed prefix-sum
packer, and BM25 scoring."""

import pytest

from connectors_spark import entry_queries

GATES = [
    "tokenize_tf",          # corpus-scale agg
    "topk_per_user",        # partitioned window ranking
    "dedup_minhash_lsh",    # banded LSH + verify joins
    "stratified_sample",    # hash sampling (must not use rand())
    "corpus_shard_pack",    # per-stratum running sums
    "sequence_pack",        # distributed prefix-sum packing
    "bm25_topk",            # scoring + rounded rank
    "facet_sibling_buckets",  # two-level float aggregation
    "terms_shard_error",    # per-shard top-N merge + error bounds
    "fim_transform",        # hash-cut string surgery (row-local)
    "text_similarity_reranker",  # retrieve window -> embedding rerank
    "bucket_count_ks_test",  # CDF windows over the day frame
    "query_rules_retriever",  # pin/exclude joins + bounded over-fetch
    "dsir_importance",      # hashed-bucket ratio table + doc sums
    "semdedup",             # centroid argmin + within-cluster pairs
    "watcher_alerts",       # last-breach carry-forward window
    "esql_sample",          # row-content Bernoulli (must not use rand())
    "esql_change_point",    # single-group argmax split
    "tool_chain_stats",     # in-array ordered chain render
    "asof_join_events",     # union-tag ordered window match
    "gapfill_timeseries",   # sequence spine + LOCF/interp windows
    "graph_pagerank",       # 5 iterations of join+agg float sums
    "tpch_shipping_priority",  # rounded-revenue TakeOrdered top-k
    "ngram_novelty",        # gram-keyed min-id + linear join
    "ngram_blocklist_filter",  # TakeOrdered gram head, broadcast back
    "dynamic_mapping_infer",   # bool_or lattice agg
    "mojibake_repair",      # row-local literal-replace chain
    "mrl_truncated_topk",   # truncated-dim cosine rank (rounded)
    "dup_span_excise",      # global keep-first rank + island cumsum
    "fingerprint_analyzer",  # token-set canonical form + group count
    "mget_docs",            # broadcast point-lookup order
    "path_hierarchy_tokens",  # prefix fan-out agg
    "context_budget_truncate",  # reverse cumsum per conversation
    "bradley_terry_arena",  # matrix reduction + driver MM solve
    "charfilter_analyze",   # char filters ahead of tokenize
    "bestfit_pack",         # pinned-width repartition + local BFD
    "embedding_contamination",  # broadcast-eval max-cos top-1
    "tool_groundedness",    # conv-partitioned lag + array intersect
    "prefix_dup_groups",    # prefix-md5 groupBy
    "ann_pq_topk",          # PQ encode argmin + LUT sum rank
    "ann_ivf_pq_topk",      # coarse-cell pruning + ADC scoring
    "tiered_merge_plan",    # exact bin()-length tiers + greedy windows
    "conv_prefix_dedup",    # conv-keyed md5 prefix + keep-longest window
    "best_of_n_selection",  # per-prompt argmax + runner-up margin
    "slm_retention_plan",   # newest-first rank + dual retention rules
    "doremi_domain_weights",  # domain-mean agg + k-row normalization
    "conv_minhash_neardup",   # conv concat -> banded LSH + Jaccard
    "ccr_follower_replay",  # max_by last-write-wins + anti-join merge
    "index_sorted_topk",    # block-metadata prune + TakeOrdered
    "ann_bit_hamming_topk",  # sign-bit packing + integer hamming rank
    "wilson_lcb_rank",      # exact-count agg + closed-form bound
    "mmr_rerank",           # k-round integer-exact greedy join DAG
    "rouge_n_overlap",      # per-pair clipped gram-count join
    "rbo_mrl_vs_exact",     # two rankings joined, integer suffix weights
    "classifier_calibration",  # integer-binned score/label sums
    "ltr_feature_log",      # scorer plan + per-candidate feature agg
    "merge_adjacent_turns",  # gaps-and-islands run merge, pinned order
    "query_difficulty_predict",  # broadcast lexicon probe + distinct-doc agg
    "prf_expansion_terms",  # feedback-doc broadcast + integer RM3 weights
    "prf_requery_topk",     # interpolated-boost override -> scorer plan
    "lm_dirichlet_topk",    # ctf agg + per-posting integer LM contributions
    "bm25_topk_lossy_norms",  # norm-byte quantization ahead of scoring
    "kneser_ney_score",     # trigram type-table joins + micro-unit sums
    "zipf_law_fit",         # TakeOrdered rank head + integer OLS sums
    "heaps_vocab_growth",   # range buckets + min-bucket first sightings
    "url_canonicalize",     # row-local regex chain + canonical-key window
    "bleu_pairs",           # multi-order gram counts + integer log sums
    "good_turing_estimate", # freq-of-freqs window + integer OLS
    "regexp_term_query",    # lexicon-pruned broadcast postings join
    "ranker_rank_correlation",  # dual-run intersection + pair self-join
    "classifier_auc",       # distinct-score cells + cumulative window
    "moving_fn_models",     # bucket self-join + broadcast coef lookup
    "chrf_pairs",           # char-gram counts + clip join + micro F sums
    "quality_length_bias",  # range buckets + integer OLS sufficient stats
    "shingle_tokens",       # 2+3-gram shingle aggs + TakeOrdered head
    "word_delimiter_tokens",  # row-local regex split chain
    "refusal_screen",       # fused rlike disjunction + conv agg
    "code_fence_qc",        # row-local fence counting, zero shuffle
    "doc_chunk_windows",    # closed-form integer chunk boundaries
    "cross_source_dup_matrix",  # prefix-keyed set agg + pair expansion
    "conv_lang_consistency",  # marker join + conv-partitioned windows
    "layout_skip_report",   # value-range sharding + envelope pruning
    "significant_terms_scoring",  # one counts frame, four heuristics
    "span_annotation_qc",   # doc-partitioned running-max overlap window
    "instruction_diversity",  # first-turn window + vocab argmax
    "injection_screen",     # fused rlike over tool turns + conv agg
    "curation_pipeline",    # quality -> dedup -> split funnel composition
    "esql_grok",            # GROK round-trip extraction + grouped stats
    "index_phrases_equivalence",  # positional vs shingle phrase agreement
    "label_centroid_similarity",  # post-agg rounded centroids + pair join
    "counter_rate",         # series-partitioned lag + reset-aware deltas
    "esql_categorize",      # CATEGORIZE grouping fn + TakeOrdered head
    "image_dhash_classes",  # real-codec dHash via mapInPandas + hash agg
    "tsid_time_series",     # _tsid agg + sortable-scalar last-value tie-break
    "tpch_returned_items",  # join-after-agg + rounded TakeOrdered head
    "tpch_large_orders",    # HAVING pre-agg before joins + TakeOrdered
    "tpch_priority_semijoin",  # LEFT SEMI shape, no probe duplication
    "tpch_shipmode_priority",  # single-pass conditional counts on a join
    "grpo_group_advantage",  # prompt-keyed window, integer-exact z-score
    "pass_at_k",            # problem-keyed agg + unrolled product
    "self_consistency_vote",  # two-level vote agg + max_by tie-break
    "histogram_quantile",   # bucket-count agg + cumulative crossing
    "scd2_intervals",       # change-detect lag + lead/version windows
    "cohort_retention",     # first-week agg + distinct pairs + offset agg
    "interval_containment_join",  # chunk-bucketed equi-join + range filter
    "wordpiece_tokenize",   # distinct-vocab HOF fold, greedy subwords
    "symspell_correct",     # deletion-key equi-join + verify + top-k
    "intervals_unordered",  # pruned position joins + width residual
    "terms_lookup_docs",    # subquery-fed broadcast semi-join
    "tree_paths",           # pointer-doubling forest resolve
    "predict_linear",       # exact-integer OLS sufficient stats
    "window_funnel",        # desc-range windows + co-keyed joins
    "knn_triangle_clustering",  # degree-oriented wedge joins
    "record_linkage",       # blocked pairs + log-likelihood weights
    "textrank_sentences",   # (doc,sent)-keyed power iterations
]


def _rows(spark, name, sf_dir):
    fn = entry_queries.queries()[name]
    df = fn(spark, sf_dir)
    return sorted(
        tuple(r) for r in df.collect()
    )


@pytest.mark.parametrize("gate", GATES)
def test_gate_is_shuffle_width_invariant(spark, sf_dir, gate):
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    wide = _rows(spark, gate, sf_dir)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, gate, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert wide == narrow, f"{gate}: rows depend on shuffle width"
    assert len(wide) > 0
