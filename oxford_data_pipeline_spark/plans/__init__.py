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
# front list rotates every round to keep each query's driver row
# fresh.  Round 13 front-loads (a) the six queries NEW this round
# (the wave-3 event family: `e_path_topk` n-step sequence mining,
# `e_cooccurrence_lift` within-session market baskets,
# `e_interarrival` gap quantiles; and the wave-4 diagnostics:
# `e_seasonality` chi-square weekday periodicity, `text_zipf_fit`
# rank-frequency corpus health, `dedup_graph_triangles`
# compact-forward triangle counting on the near-dup graph) plus the
# two that CHANGED —
# `a14_sessionize` (session assignment factored into the shared
# `session_assignments` helper / `_SESSION_ASSIGN_CTES` now reused by
# the co-occurrence query; result-identical, re-proven here) and
# `e_audience_overlap` (r12 advisor item 1: dead-code ternary removed
# from the uregs join — plan-identical, re-proven here); then (b) the
# 17 queries whose newest driver row is r9 (round-12 verdict item 1,
# deferred from the r12 window); then (c) 25 of the 48 r10-stale
# queries, highest-risk first (multi-stage dedup/sim/emb/retrieval
# pipelines and the flagship composite).  That fills all 50 slots.
# The 23 r10 rows deferring to r14 are the least-risk ones: untouched
# single-pass curation gates/samplers (`cur_*`) and three single-agg
# text/mm kernels, all green in the
# regenerated ORACLE_PARITY.json at both SFs every round and
# exercised by the suite.  Only ORACLE-CHECKED queries go in the
# window — a rows-only query would burn a slot on an err:"no_oracle"
# record.  Rotation reorders, never drops; the suite's own oracle
# tests still cover the full set.
_ROUND13_FRONT = [
    # (a) new + materially changed this round
    "e_path_topk", "e_cooccurrence_lift", "e_interarrival",
    "e_seasonality", "text_zipf_fit", "dedup_graph_triangles",
    "a14_sessionize", "e_audience_overlap",
    # (b) the r9-stale cohort (newest driver row = r9)
    "e_set_ops", "f9_significance_filter", "m10_wilcoxon_stat",
    "m11_cohens_d", "m13_effective_dim", "m16_spearman",
    "m3_weight_minmax_norm", "m5_relational_matmul", "m9_pearson_corr",
    "o1_anatomical_order", "o3_seeded_sample", "o4_truncate_min_length",
    "sc_scalar_functions", "w4_peak_amplitude", "w5_percentile_threshold",
    "w6_contiguous_folds", "w7_first_match_baseline",
    # (c) 25 of the 48 r10-stale queries (multi-stage pipelines first;
    # the 23 deferred to r14 are single-pass cur_* gates/samplers plus
    # text_tfidf_top_terms / mm_audio_features / mm_image_features)
    "oxford_pipeline", "j9_asof_join", "e_json_props",
    "dedup_clusters", "dedup_embedding_cosine", "dedup_incremental",
    "dedup_pagerank_canonical", "dedup_semantic", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_survivors", "dedup_url_survivors",
    "dedup_winnowing",
    "emb_hard_negatives", "emb_label_cohesion", "emb_outliers",
    "sim_compression_ladder", "sim_cosine_topk", "sim_ivf_retrain",
    "sim_lsh_ann", "sim_matryoshka_recall", "sim_sq8_recall",
    "ret_phrase_search", "text_dup_span_cut", "text_postings_incremental",
]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names unknown queries: {missing}"
    for d in (QUERIES, ORACLES):
        ordered = [n for n in front if n in d] + [n for n in d if n not in front]
        items = {n: d[n] for n in ordered}
        d.clear()
        d.update(items)


_rotate(_ROUND13_FRONT)

# r14 FRONT-LOAD LIST: the 23 r10-stale rows deferred above
# (`cur_adaptive_quality_gate`, `cur_bigram_surprisal`,
# `cur_bloom_prefilter`, `cur_c4_heuristics`, `cur_corpus_diff`,
# `cur_corpus_drift`, `cur_decontaminate`, `cur_dsir_weights`,
# `cur_length_profile`, `cur_mixture_weights`, `cur_pack_stats`,
# `cur_pii_scrub`, `cur_pipeline`, `cur_provenance`,
# `cur_quality_classifier`, `cur_repetition`, `cur_stratified_sample`,
# `cur_temperature_mix`, `cur_term_cms`, `cur_unigram_surprisal`,
# `text_tfidf_top_terms`, `mm_audio_features`, `mm_image_features`),
# then the r11-stale cohort.
# (`text_longest_dup_substring` is rows-only by design — it never
# takes a window slot.)

__all__ = ["QUERIES", "ORACLES", "register"]
