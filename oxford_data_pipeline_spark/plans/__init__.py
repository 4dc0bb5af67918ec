"""Query plans: named queries + their DuckDB oracle SQL.

Importing this package populates the registry from every plan module.
Imports are strict — a broken plan module must fail loudly, never
silently drop its queries from the driver contract.
"""

from oxford_data_pipeline_spark.plans.registry import ORACLES, QUERIES, register
from oxford_data_pipeline_spark.plans import (  # noqa: F401  (registration side effects)
    flagship,
    relational,
    windows,
    projection,
    stats,
    alignment,
    coverage_fill,
    cross_session,
    curation,
    dedup,
    eventops,
    similarity,
    textops,
    mlops,
    multimodal,
    oxford,
    quality,
    retrieval,
)

# Driver-snapshot rotation (round-4 verdict item 7): the external
# driver records correctness rows for roughly the FIRST 50 registry
# entries only, so registration order is driver exposure, and the
# front list rotates every round to keep each query's driver row <= 2
# rounds old.  Round 9 front-loads (a) queries NEW or materially
# CHANGED this round (URL-tier dedup + domain mix, combined-churn
# recall, the re-attributed hybrid audit, the zero-guarded A-ES
# sample), then (b) the ENTIRE round-6-stale cohort — the 44 oracle
# queries whose newest driver row is r6 (round-8 verdict item 2), so
# after this round no driver row is older than r8.  Only
# ORACLE-CHECKED queries go in the window — a rows-only query would
# burn a slot on an err:"no_oracle" record.  Rotation reorders, never
# drops; the suite's own oracle tests still cover the full set.
_ROUND9_FRONT = [
    # (a) NEW or materially CHANGED this round (cur_weighted_sample
    # also changed — zero-weight guard — but its driver row is r8 and
    # parity re-verified at both SFs, so it yields its slot to the
    # changed mm_jpeg_decode, whose output schema gained the 12-bit
    # verdict column)
    "dedup_url", "cur_domain_mix", "cur_domain_blocklist",
    "sim_ivf_churn_recall", "ret_hybrid_rrf_audit", "mm_jpeg_decode",
    # (dedup_url_survivors, added late in round 9, stays OUT of this
    # window: the r6-cohort completeness below takes the remaining
    # slots; its parity is pinned at both SFs and it rotates in at r10)
    # (b) the r6-stale cohort (newest driver row = r6 for all 44)
    "j3_pair_selfjoin", "j4_fact_join_chain", "j8_fold_train_split",
    "e_set_ops", "o1_anatomical_order", "o3_seeded_sample",
    "sc_scalar_functions", "a4_connectivity_pivot", "a5_max_then_mean",
    "a6_label_distribution", "a7_threshold_grid", "a8_count_stats",
    "a9_rollup_summary", "a10_hierarchical_rollup", "a11_cumulative_share",
    "w2_removal_schedule", "w3_restricted_peak", "w5_percentile_threshold",
    "w6_contiguous_folds", "w7_first_match_baseline", "a12_mc_average",
    "m5_relational_matmul", "m3_weight_minmax_norm", "m9_pearson_corr",
    "m11_cohens_d", "m13_effective_dim", "m16_spearman",
    "m10_wilcoxon_stat", "w4_peak_amplitude", "o4_truncate_min_length",
    "f9_significance_filter", "j7_condition_weight_reuse",
    "a3_cross_session_agg", "f11_flip_detection", "text_quality",
    "text_langid", "text_langid_confusion", "text_chunking",
    "text_chunk_dedup", "dedup_containment", "dedup_lsh_audit",
    "dedup_survivors_keep_longest", "mm_image_decode", "mm_audio_decode",
]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names unknown queries: {missing}"
    for d in (QUERIES, ORACLES):
        ordered = [n for n in front if n in d] + [n for n in d if n not in front]
        items = {n: d[n] for n in ordered}
        d.clear()
        d.update(items)


_rotate(_ROUND9_FRONT)

__all__ = ["QUERIES", "ORACLES", "register"]
