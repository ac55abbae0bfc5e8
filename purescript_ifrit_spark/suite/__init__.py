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
    REGISTRY,
    SparkFn,
    register,
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
# hard check ages past two rounds. Rows-only entries yield their slots —
# a `no_oracle` row can never go hash-green, so it wastes a hard-signal
# slot (VERDICT r5 item 2: x_dau_approx / x_ann_ivf_topk are dropped
# this round for exactly that reason); their behavior stays pinned by
# paired exact twins, planted-oracle conversions, and pytest envelopes.
#
# Round-7 composition (VERDICT r6 #1/#7 — planned at round start, 50 slots):
#   1. the 7 r3-stale entries FIRST — `x_anti_join`, `x_semi_join`,
#      `x_set_ops`, `x_multimodal_framesample` and the three streaming
#      twins: their last hard check was round 3 and the rotation
#      invariant ("no entry ages past two rounds") is violated for
#      exactly these seven (VERDICT r6 item 1);
#   2. the new round-7 oracle entries as they land (PLANNED:
#      x_knn_join_planted, x_bpe_encode_planted,
#      x_training_shards_planted, x_streaming_dau_planted — the four
#      planted-oracle conversions of VERDICT r6 #3 — plus
#      x_multimodal_jpeg (#4) and xd_image_dhash (#6); late additions
#      beyond these displace backfill tail BY THIS POLICY, recorded
#      here, not by accident);
#   3. backfill: the r4-last-checked oracle cohort in ledger order
#      (44 entries; the tail that new r7 entries displace waits for r8
#      — after r7 every surviving backfill entry's last check is ≥ r4
#      and every non-window oracle entry's is ≥ r5).
#
# Everything else (checked r5/r6 AND duplicated by
# tests/test_oracle_parity.py every round) follows after the window.

_DRIVER_WINDOW_R7 = [
    # -- (1) the 7 r3-stale entries (rotation-invariant repair) ------------
    "x_anti_join",
    "x_semi_join",
    "x_set_ops",
    "x_multimodal_framesample",
    "x_streaming_windowed",
    "x_streaming_session",
    "x_streaming_state",
    # -- (2) new round-7 oracle entries land HERE as built ------------------
    "x_knn_join_planted",
    "x_ann_lsh_planted",
    "x_ann_ivf_planted",
    "x_hll_distinct_planted",
    "x_dau_bound_planted",
    "x_bpe_encode_planted",
    "x_training_shards_planted",
    "x_streaming_dau_planted",
    "x_multimodal_jpeg",
    "xd_image_dhash",
    "x_bm25_topk",
    "x_truncate_docs",
    "x_pack_text",
    "x_leakage_split",
    "x_audio_activity",
    "x_scene_changes",
    "x_duplicate_spans",
    "x_span_dup_stats",
    "x_gopher_quality",
    "x_mixture_weights",
    "xd_gopher",
    "x_multimodal_resize",
    "x_pagerank_planted",
    "x_corpus_diff",
    "x_fuzzy_join",
    "x_unicode_nfc",
    "x_url_canonicalize",
    "x_kmeans_planted",
    "x_vocab_growth",
    "x_mojibake_repair",
    "x_domain_blocklist",
    "x_pmi_collocations",
    "x_script_profile",
    "x_c4_line_filter",
    "x_line_dedup_global",
    "x_jaccard_join_prefix",
    "x_cdc_chunks",
    "x_semdedup_planted",
    "xd_c4",
    "x_vocab_coverage",
    "x_mmr_planted",
    "x_extract_links",
    "x_hard_negatives_planted",
    # -- (3) r4-cohort backfill, ledger order (fully displaced by the
    #        session-2 additions; the r4 cohort heads the r8 queue) ---------
    # (displaced to r8 by the late-r7 additions, per the round-start
    # policy above: x_embedding_neardup, x_sessionize, x_funnel,
    # x_retention by the four planted conversions; xd_quality_where,
    # xd_split, x_budget_sample, x_ann_cosine_topk by the four new
    # operator entries; xd_quality_filter by xd_gopher; xd_chunk by
    # x_multimodal_resize; xd_lang_id by x_pagerank_planted;
    # xd_quality by x_corpus_diff; xd_token_count by x_fuzzy_join;
    # xd_dedup_exact by x_unicode_nfc; x_contamination by
    # x_url_canonicalize; x_token_rarity by x_kmeans_planted;
    # x_fingerprint by x_vocab_growth; x_text_quality by
    # x_mojibake_repair; x_lang_id by x_domain_blocklist;
    # x_text_token_count by x_pmi_collocations; x_curate_exact by
    # x_script_profile; x_dedup_simhash_planted by x_c4_line_filter;
    # x_dedup_incremental_planted by x_line_dedup_global;
    # x_dedup_minhash_planted by x_jaccard_join_prefix;
    # x_dedup_exact by x_cdc_chunks; p2_nested_projection by
    # x_semdedup_planted; s2_derived_table by xd_c4; a1_a3_group_avg by
    # x_vocab_coverage; o3_limit_before_offset by x_mmr_planted;
    # f1_eq by x_extract_links; p1_projection by
    # x_hard_negatives_planted)
]


# Session-3 additions arrived AFTER the 50-slot window saturated with
# never-driver-checked r7 entries (7 stale + 43 new) — there is no
# backfill left to displace, and displacing another never-checked entry
# would be a zero-sum shuffle. These queue at the HEAD of the r8 window
# instead; tests/test_coverage_ledger.py enforces that every
# never-checked oracle entry is either windowed or pinned here, so an
# entry can saturate out of the window but never silently drop out of
# the rotation.
_R8_QUEUE_HEAD = [
    "x_chat_stats",
    "x_sft_spans",
    "x_preference_pairs",
    "x_zorder_key",
    "x_layout_pruning",
    "x_skew_profile",
    "x_robots_filter",
    "x_mergeable_stats",
    "x_chat_truncate",
    # session-4 additions (inverted index, JL projection, compaction)
    "x_inverted_index",
    "x_jl_project",
    "x_compact_roundtrip",
    "x_interval_join",
    "x_streaming_interval_join",
    "xd_jl_project",
    "x_contribution_cap",
    "x_kanon_suppress",
    "x_gap_fill_locf",
    "x_gap_fill_interp",
    "x_markdown_sections",
    "x_time_weighted_avg",
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


_apply_driver_window(_DRIVER_WINDOW_R7)
