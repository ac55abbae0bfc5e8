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
# per-entry driver history): never-verified ORACLE entries enter first,
# then the entries with the OLDEST last driver check, so no entry's last
# hard check ages past two rounds. Rows-only entries yield their slots —
# a `no_oracle` row can never go hash-green, so it wastes a hard-signal
# slot (VERDICT r5 item 2: x_dau_approx / x_ann_ivf_topk are dropped
# this round for exactly that reason); their behavior stays pinned by
# paired exact twins, planted-oracle conversions, and pytest envelopes.
#
# Round-6 composition (VERDICT r5 #2, exactly 50):
#   1. the 11 round-5 late additions that are oracle-backed but have
#      never been driver-checked;
#   2. the 13 new round-6 oracle entries (planted conversions of the CMS /
#      Misra-Gries / approx-percentile sketches + the cluster-size
#      histogram, the baseline-PNG decode, the VECTORIZE / QUALITY_SCORE
#      dialect functions, URL-domain stats, encoding quality, packing
#      stats);
#   3. the r3-only cohort — oracle entries whose last driver check was
#      round 3, ledger order (26 of 33 fit; the 7 tail entries wait for
#      r7, never-verified newcomers outrank backfill).
#
# Everything else (checked r4/r5 AND duplicated by
# tests/test_oracle_parity.py every round) follows after the window.

_DRIVER_WINDOW_R6 = [
    # -- (1) round-5 late additions, oracle-backed, never driver-checked --
    "x_term_spectrum",
    "x_vocab_divergence",
    "x_ngram_novelty",
    "x_bpe_pairs",
    "xd_htmltext",
    "x_shuffle_shards",
    "x_winsorize",
    "x_quantile_normalize",
    "x_label_entropy",
    "x_label_dispersion",
    "x_multimodal_video",
    # -- (2) new round-6 oracle entries ------------------------------------
    "x_cms_probe_planted",
    "x_heavy_hitters_mg_planted",
    "x_percentiles_approx_planted",
    "x_multimodal_png",
    "xd_vectorize",
    "xd_quality_score",
    "x_url_domains",
    "x_encoding_quality",
    "x_packing_stats",
    "x_cluster_stats_planted",
    "x_dedup_keep_best_planted",
    "x_dedup_incremental_simhash_planted",
    "x_image_dedup_planted",
    # -- (3) the r3-only cohort (oldest last check), ledger order ----------
    # (never-verified oracle entries outrank backfill, so the cohort's 7
    # tail entries — x_set_ops, x_anti_join, x_semi_join,
    # x_multimodal_framesample and the three streaming twins, each
    # pytest-verified every round — wait for r7)
    "x_dedup_clusters_planted",
    "x_chunk_documents",
    "x_pack_sequences",
    "x_rolling_fingerprint",
    "x_explode_chunks",
    "x_pii_redact",
    "x_term_stats",
    "x_tfidf_topk",
    "x_repetition_stats",
    "xd_redact",
    "xd_tumble_hourly",
    "xd_sessionize",
    "x_split_train_val",
    "x_hash_sample",
    "x_stratified_fixed_k",
    "x_stratified_sample",
    "x_embedding_centroids",
    "x_events_hourly",
    "x_running_total",
    "x_equidepth_buckets",
    "x_asof_join",
    "x_asof_forward",
    "x_range_join",
    "x_rollup_multi",
    "x_tpch_q18ish",
    "x_partitioned_sink",
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


_apply_driver_window(_DRIVER_WINDOW_R6)
