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
# rounds old.  Round 8 front-loads (a) queries NEW or materially
# CHANGED this round (hybrid serving-leg swap + audit, df-memoized
# BM25, the zero-norm-guarded IVF family), (b) the round-4 rows (the
# oldest anywhere), (c) the round-5 rows, then (d) as much of the
# round-6 set as fits.  Only ORACLE-CHECKED queries go in the window —
# a rows-only query would burn a slot on an err:"no_oracle" record.
# Rotation reorders, never drops; the suite's own oracle tests still
# cover the full set.
_ROUND8_FRONT = [
    # (a) NEW or materially CHANGED this round: the hybrid serving-leg
    # swap + its audit, the df-memoized BM25, the whole IVF family
    # touched by the zero-norm quarantine guard, and the queries added
    # later in the round (perceptual-hash near-dup, RM3, snippets, MMR,
    # topic balance, cluster split, IVF tombstone delete, and
    # mm_jpeg_decode's new progressive-identity column)
    "ret_mmr", "cur_topic_balance", "cur_cluster_split", "sim_ivf_delete",
    "mm_jpeg_decode", "cur_weighted_sample", "cur_vocab_hll",
    "sim_ivf_delete_recall", "cur_classifier_train", "cur_classifier_scored",
    "cur_classifier_calibration", "dedup_labels_incremental",
    "mm_phash", "mm_phash_neardup", "ret_rm3_expansion", "ret_snippets",
    "emb_knn_classify",
    "ret_hybrid_rrf", "ret_hybrid_rrf_audit", "text_bm25_topk",
    "sim_ivf_ann", "sim_ivf_recall", "sim_ivf_incremental",
    "sim_ivf_incremental_recall", "sim_ivfpq_ann", "sim_ivfpq_recall",
    "sim_ivfpq_rerank", "sim_ivfpq_rerank_recall",
    # (b) oldest driver rows (round 4)
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped", "text_fingerprint", "text_token_count",
    # (c) round-5 rows
    "j1_event_psth", "m12_sign_alignment", "m1_cca_closed_form",
    "m4_pca_closed_form", "m6_glm_closed_form", "mm_frame_sample",
    "mm_metadata_profile", "sim_lsh_recall", "text_bpe_compression",
    "text_bpe_merges", "text_dup_ngram_coverage", "text_dup_spans",
    # (d) round-6 rows, oldest families first (the rest of the r6 set
    # rotates in next round)
    "f_predicate_stack", "f5_having_admission", "f7_min_distinct",
    "j2_dim_enrichment", "j3_pair_selfjoin", "j4_fact_join_chain",
    "j8_fold_train_split", "e_set_ops", "o1_anatomical_order",
    "o3_seeded_sample", "sc_scalar_functions", "a4_connectivity_pivot",
]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names unknown queries: {missing}"
    for d in (QUERIES, ORACLES):
        ordered = [n for n in front if n in d] + [n for n in d if n not in front]
        items = {n: d[n] for n in ordered}
        d.clear()
        d.update(items)


_rotate(_ROUND8_FRONT)

__all__ = ["QUERIES", "ORACLES", "register"]
