"""The operator-coverage suite: one named query per implemented operator
from SURVEY.md §2, each paired with an ANSI-SQL oracle that DuckDB can run
on the same parquet tables.

This module backs `__spark_entry__.py` (the driver contract). Every entry is

    name -> (spark_fn, oracle_sql | None)

where `spark_fn(spark, sf_dir) -> DataFrame` exercises OUR engine (the
dialect compiler or an operators/ extension) and `oracle_sql` recomputes the
same result in plain SQL. Column names are aliased identically on both
sides; float aggregates are rounded to 6 decimals on both sides so the
driver's order-insensitive value-hash is robust to summation-order noise.

Determinism notes: every LIMIT query orders by a unique key (or a key
chain ending in one); collect_list results are sorted + joined to a string
on both sides.
"""

from __future__ import annotations

from purescript_ifrit_spark.suite._registry import (  # noqa: F401
    DEMO_REGISTRY,
    REGISTRY,
    SparkFn,
    register,
    register_demo,
)

# Import order populates REGISTRY; the driver window below pins the
# first 50 positions regardless, so order here is cosmetic.
from purescript_ifrit_spark.suite import (  # noqa: E402,F401
    core,
    dedup,
    text,
    dialect,
    sampling,
    vectors,
    analytics,
    graph,
    joins,
    multimodal,
    streaming,
    chat,
    layout,
)
from purescript_ifrit_spark.suite.core import flagship  # noqa: E402,F401



# ===========================================================================
# Driver-window ordering
# ===========================================================================
#
# The driver's correctness harness checks the FIRST 50 registry entries
# (dict insertion order). Rotation policy (COVERAGE.md ledger records the
# per-entry driver history): never-verified ORACLE entries enter first,
# then the entries with the OLDEST last driver check, so no entry's last
# hard check ages past two rounds. Since r8 there are NO rows-only
# entries in the driver registry at all (VERDICT r7 #4): the 15
# approximate/composition demos moved to DEMO_REGISTRY, so every
# `queries()` name has an `oracle_sql()` twin and `no_oracle` driver rows
# are structurally impossible.
#
# Round-10 composition (VERDICT r9 #1 — planned at round start, 50 slots):
#   1. the 23-entry declared r10 spill FIRST (_R10_SPILL exactly as
#      stated at r9 round start, order preserved — last hard check r5,
#      the oldest thing in the registry; test-pinned since r9);
#   2. backfill: the r6-last-checked oracle cohort in ledger order (50
#      such entries exist; 27 fit the round-start window);
#   3. new round-10 oracle entries land at the END of the window as
#      built, each displacing the backfill TAIL by the stated policy and
#      recorded inline here (PLANNED: x_rrf_batch — VERDICT r9 #3,
#      x_profile_table_types — VERDICT r9 #7, x_streaming_index_fold —
#      VERDICT r9 #4).
#
# Explicit r11 spill (the same stated-plan discipline as r8/r9): the
# r6-cohort entries that do NOT fit the r10 window — see _R11_SPILL
# below — plus any backfill tail displaced by new r10 entries. All
# spilled entries remain pytest-verified by tests/test_oracle_parity.py
# every round and MUST head the r11 window.

# The r9 window is kept as the historical record the ledger narrative
# cites; _R10_SPILL (below) is the stated r10 head it promised.
_DRIVER_WINDOW_R9 = [
    # -- (1) the declared r9 spill (last hard check r4) ---------------------
    "x_sessionize",
    "x_funnel",
    "x_retention",
    "x_topk_per_group",
    "x_percentiles",
    "x_distinct_count",
    "x_pivot_events",
    "x_robust_outliers",
    "x_join_star",
    "x_json_extract",
    "x_tpch_q1ish",
    "x_tpch_q3ish",
    "x_tpch_q5ish",
    "x_multimodal_features",
    "x_multimodal_decode",
    "x_multimodal_audio",
    # -- (2) the core SURVEY §2 contract cohort (last check r5) ------------
    "p3_alias",
    "f1_neq",
    "f2_lt_gt",
    "f3_lte_via_not",
    "f3_gte_direct",
    "f4_and",
    "f5_or",
    "f6_not_demorgan",
    "f7_bare_boolean",
    "f8_null_compare",
    "f9_reversed_literal",
    "o1_o2_topk",
    "o4_pregroup_sort_limit",
    "a2_group_by_null",
    "a4_group_sum",
    "a5_group_min_max",
    "a6_group_count",
    "a7_push_collect",
    "b1_avg_array",
    "b3_sum_array",
    "b4_min_max_array",
    "b6_count_array",
    "b2_avg_nested_array",
    "b5_max_nested_array",
    # -- (3) new round-9 oracle entries -------------------------------------
    "xd_bm25",
    "x_bm25_batch",
    "x_rrf_fusion",
    "x_streaming_index_dedup",
    "x_xent_against",
    "x_dsir_weights",
    "x_profile_table",
    "xd_nfc",
    "x_tpch_q12ish",
    # -- (4) r5-cohort backfill --------------------------------------------
    "x_dedup_ngram_planted",
]

# The stated r10 head (pinned at r9 round start; all last hard check r5).
_R10_SPILL = [
    "x_feature_hash",  # displaced from the r9 backfill tail by xd_bm25
    "x_embedding_quantize",   # displaced by x_bm25_batch
    "x_embedding_normalize",  # displaced by x_rrf_fusion
    "x_bigram_xent",          # displaced by x_streaming_index_dedup
    "x_html_extract",         # displaced by x_xent_against
    "x_unigram_xent",         # displaced by x_dsir_weights
    "x_quality_topfrac",      # displaced by x_profile_table
    "x_blocklist_dedup",      # displaced by xd_nfc
    "x_dedup_subdoc",         # displaced by x_tpch_q12ish
    "x_linear_filter",
    "x_temperature_mix",
    "x_dau_exact",
    "x_ohlc_bars",
    "x_moving_avg",
    "x_hopping_agg",
    "x_value_histogram",
    "x_corr_stats",
    "x_cube_counts",
    "x_heavy_hitters",
    "x_source_overlap_exact",
    "x_source_overlap_sketch",
    "x_corpus_report",
    "x_salted_join",
]

_DRIVER_WINDOW_R10 = [
    # -- (1) the declared r10 spill, exactly as stated at r9 round start ----
    *_R10_SPILL,
    # -- (2) r6-cohort backfill, ledger order (27 fit at round start; the
    #        tail is displaced by new r10 entries as recorded in (3)) ------
    "x_dedup_clusters_planted",
    "x_cluster_stats_planted",
    "x_dedup_keep_best_planted",
    "x_dedup_incremental_simhash_planted",
    "x_chunk_documents",
    "x_pack_sequences",
    "x_rolling_fingerprint",
    "x_explode_chunks",
    "x_pii_redact",
    "x_term_stats",
    "x_tfidf_topk",
    "x_repetition_stats",
    "x_term_spectrum",
    "x_vocab_divergence",
    "x_ngram_novelty",
    "x_bpe_pairs",
    "x_url_domains",
    "x_encoding_quality",
    "x_packing_stats",
    "xd_redact",
    "xd_tumble_hourly",
    # -- (3) new round-10 oracle entries land HERE as built, each
    #        displacing the backfill tail above (first displaced:
    #        x_split_train_val, then x_embedding_centroids, ...) ------------
    "x_rrf_batch",      # grouped RRF (VERDICT r9 #3) — displaces
                        # x_split_train_val
    "x_profile_table_types",  # 5-type profiler oracle (VERDICT r9 #7) —
                              # displaces x_embedding_centroids
    "x_streaming_index_fold",  # survivor-sink index fold (VERDICT r9
                               # #4) — displaces xd_quality_score
    "x_ann_batch",      # batch brute ANN, r10 partial-top-k reshape —
                        # displaces xd_vectorize
    "x_ann_ivf_batch_planted",  # batch IVF ANN (new r10) — displaces
                                # xd_htmltext
    "x_bm25_indexed",   # prebuilt-index batch BM25 (new r10) —
                        # displaces xd_sessionize
]

# The r6-cohort entries that wait for r11 (ledger order; grows as new
# r10 entries displace the backfill tail above).
# tests/test_coverage_ledger.py pins this list against the ledger so the
# spill is a stated plan, not an accident.
_R11_SPILL = [
    "x_split_train_val",  # displaced from the r10 backfill tail by
                          # x_rrf_batch
    "x_embedding_centroids",  # displaced by x_profile_table_types
    "xd_quality_score",       # displaced by x_streaming_index_fold
    "xd_vectorize",           # displaced by x_ann_batch
    "xd_htmltext",            # displaced by x_ann_ivf_batch_planted
    "xd_sessionize",          # displaced by x_bm25_indexed
    "x_hash_sample",
    "x_stratified_fixed_k",
    "x_stratified_sample",
    "x_shuffle_shards",
    "x_events_hourly",
    "x_running_total",
    "x_equidepth_buckets",
    "x_asof_join",
    "x_asof_forward",
    "x_range_join",
    "x_rollup_multi",
    "x_winsorize",
    "x_quantile_normalize",
    "x_label_entropy",
    "x_label_dispersion",
    "x_cms_probe_planted",
    "x_heavy_hitters_mg_planted",
    "x_percentiles_approx_planted",
    "x_tpch_q18ish",
    "x_partitioned_sink",
    "x_multimodal_png",
    "x_multimodal_video",
    "x_image_dedup_planted",
]

# Oracle entries that land AFTER the r10 window saturates queue here for
# the r11 head (the session-3 precedent). Six new r10 entries displaced
# backfill tail before the window-composition balance point (21 r6
# backfill slots kept); later additions queue instead of displacing.
_R11_QUEUE_HEAD: list = [
    "x_streaming_bm25",  # streaming retrieval vs the static BM25 index
    "xd_simhash",        # SIMHASH dialect function (r10)
]


def _apply_driver_window(window: list) -> None:
    ordered: Dict[str, Tuple[SparkFn, Optional[str]]] = {}
    for name in window:
        ordered[name] = REGISTRY[name]  # KeyError on typo = fail at import
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window(_DRIVER_WINDOW_R10)
