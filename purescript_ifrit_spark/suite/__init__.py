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
# Round-8 composition (VERDICT r7 #1 — planned at round start, 50 slots):
#   1. the 21 never-driver-checked session-3/4 oracle entries FIRST (the
#      r7 _R8_QUEUE_HEAD, order preserved) — pytest-green since they
#      landed, but the hard driver signal is still owed;
#   2. the seven core SURVEY §2 contract entries whose last hard check is
#      r4 — `p1_projection`, `p2_nested_projection`, `s2_derived_table`,
#      `o3_limit_before_offset`, `a1_a3_group_avg`, `f1_eq`,
#      `x_dedup_exact` — position-pinned so late additions cannot push
#      the core contract past the two-round staleness invariant again
#      (VERDICT r7 residual: the §2 cohort was the stalest thing in the
#      registry);
#   3. new round-8 oracle entries land AFTER the core block as built
#      (PLANNED: xd_bm25 — VERDICT r7 #8), each displacing the backfill
#      TAIL by this policy, recorded here, not by accident;
#   4. backfill: the remaining r4-last-checked oracle cohort in ledger
#      order (37 entries; 22 fit the initial 50 before new-entry
#      displacement).
#
# Explicit r9 spill (VERDICT r7 #1 asked for this statement): the r4
# cohort entries that do NOT fit the r8 window and whose last hard check
# stays r4 until r9 — `x_funnel`, `x_retention`, `x_topk_per_group`,
# `x_percentiles`, `x_distinct_count`, `x_pivot_events`,
# `x_robust_outliers`, `x_join_star`, `x_json_extract`, `x_tpch_q1ish`,
# `x_tpch_q3ish`, `x_tpch_q5ish`, `x_multimodal_features`,
# `x_multimodal_decode`, `x_multimodal_audio`, plus the backfill tail
# displaced by new r8 entries (first displaced: `x_sessionize`, then
# `x_budget_sample`, ...). All spilled entries remain pytest-verified by
# tests/test_oracle_parity.py every round and MUST head the r9 window.

_DRIVER_WINDOW_R8 = [
    # -- (1) the 21 never-driver-checked entries (r7 queue head) -----------
    "x_chat_stats",
    "x_sft_spans",
    "x_preference_pairs",
    "x_zorder_key",
    "x_layout_pruning",
    "x_skew_profile",
    "x_robots_filter",
    "x_mergeable_stats",
    "x_chat_truncate",
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
    # -- (2) the core SURVEY §2 contract cohort (last check r4) ------------
    "p1_projection",
    "p2_nested_projection",
    "s2_derived_table",
    "o3_limit_before_offset",
    "a1_a3_group_avg",
    "f1_eq",
    "x_dedup_exact",
    # -- (3) new round-8 oracle entries land HERE as built ------------------
    "xd_minhash",   # MINHASH dialect family (VERDICT r7 #8) — displaces
                    # x_sessionize (backfill tail) per the stated policy
    # -- (4) r4-cohort backfill, ledger order (tail displaced by (3)) ------
    "x_dedup_minhash_planted",
    "x_dedup_incremental_planted",
    "x_dedup_simhash_planted",
    "x_curate_exact",
    "x_text_token_count",
    "x_text_quality",
    "x_lang_id",
    "x_fingerprint",
    "x_token_rarity",
    "x_contamination",
    "xd_dedup_exact",
    "xd_token_count",
    "xd_quality",
    "xd_lang_id",
    "xd_chunk",
    "xd_quality_filter",
    "xd_quality_where",
    "xd_split",
    "x_ann_cosine_topk",
    "x_embedding_neardup",
    "x_budget_sample",
]

# The r4-cohort entries that wait for r9 (see the spill note above).
# tests/test_coverage_ledger.py pins this list against the ledger so the
# spill is a stated plan, not an accident.
_R9_SPILL = [
    "x_sessionize",  # displaced from the r8 backfill tail by xd_minhash
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
]

# Oracle entries that land AFTER the r8 window saturates queue here for
# the r9 head (the session-3 precedent); empty at round start.
_R9_QUEUE_HEAD: list = []


def _apply_driver_window(window: list) -> None:
    ordered: Dict[str, Tuple[SparkFn, Optional[str]]] = {}
    for name in window:
        ordered[name] = REGISTRY[name]  # KeyError on typo = fail at import
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window(_DRIVER_WINDOW_R8)
