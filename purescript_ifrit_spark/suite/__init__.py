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
    joins,
    multimodal,
    streaming,
)
from purescript_ifrit_spark.suite.core import flagship  # noqa: E402,F401



# ===========================================================================
# Driver-window ordering
# ===========================================================================
#
# The driver's correctness harness checks the FIRST 50 registry entries
# (dict insertion order). Rotation policy (COVERAGE.md ledger records the
# per-entry driver history): changed-this-round and never-verified entries
# enter first, then the entries with the OLDEST last driver check, so no
# entry's last hard check ages past two rounds. Round-5 composition is the
# one VERDICT r4 #4 prescribed:
#
#   1. the two entries reshaped this round (r4's only red cells — flat
#      posexplode output so the driver comparator can canonicalize them)
#      stay at positions 0-1;
#   2. the new round-5 DAU pair (never driver-verified);
#   3. all 24 r1/r2-only core §2 dialect rows — no driver pass since r2,
#      two rounds of lexer/parser/planner refactoring ago;
#   4. backfill with the oldest r3-only entries (one driver check each).
#
# Everything else (checked r3/r4 AND duplicated by
# tests/test_oracle_parity.py every round) follows after the window.

_DRIVER_WINDOW_R5 = [
    # -- (1) reshaped this round (VERDICT r4 #1) ---------------------------
    "x_embedding_normalize",
    "x_embedding_quantize",
    # -- (2) new round-5 operators, never driver-verified ------------------
    # (oracle-backed entries first — the policy's "never-verified enter
    # first" outranks backfill; rows-only newcomers except the DAU/exact
    # pair yield their slots, since their hard signal lives in the paired
    # exact twins and pytest envelopes)
    "x_dau_exact",
    "x_dau_approx",
    "x_dedup_subdoc",
    "x_unigram_xent",
    "x_corr_stats",
    "x_cube_counts",
    "x_quality_topfrac",
    "x_ohlc_bars",
    "x_moving_avg",
    "x_hopping_agg",
    "x_value_histogram",
    "x_salted_join",
    "x_blocklist_dedup",
    "x_heavy_hitters",
    "x_source_overlap_exact",
    "x_source_overlap_sketch",
    "x_html_extract",
    "x_temperature_mix",
    "x_bigram_xent",
    "x_feature_hash",
    "x_linear_filter",
    "x_corpus_report",
    # -- (3) the 24 r1/r2-only §2 dialect rows -----------------------------
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
    # -- (4) oldest r3-only entries, ledger order --------------------------
    # (the remaining r3-only and r1/r2-extension rows — and the rows-only
    # newcomers x_knn_join / x_percentiles_approx / x_streaming_dau /
    # x_heavy_hitters_mg / x_shuffle_shards / x_term_spectrum — queue for
    # the r6 window behind this round's never-verified oracle entries)
    "x_dedup_ngram_planted",
    "x_ann_ivf_topk",
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


_apply_driver_window(_DRIVER_WINDOW_R5)
