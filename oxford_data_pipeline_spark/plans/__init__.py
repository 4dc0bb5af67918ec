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
# rounds old.  Round 11 front-loads (a) `dedup_paragraph_survivors` —
# the only oracle query that has NEVER had a driver row (landed after
# the r10 snapshot; round-10 verdict item 1) — plus the four queries
# fully NEW this round (`sim_ivf_drift` the retrain-trigger poll,
# `e_funnel`/`e_retention` event analytics, `sim_serving_ndcg` the
# order-aware serving-quality audit) and the two that materially
# CHANGED this round: `dedup_paragraph` (aggregation re-keyed from
# raw text to md5 fingerprints, verdict item 3) and `mm_jpeg_decode`
# (gained `hier_exact` after the r10 front froze — promised for r11 —
# and this round's `arith_eq_seq` arithmetic-coding gate); then
# (b) 43 of the 48 oracle queries whose newest driver row is r8.
# That fills all 50 slots exactly.  Five candidates yield their slots and rotate in at
# r12 with the r9-stale cohort: `ret_hybrid_rrf_audit` (r9 row green;
# every change since was result-preserving memoization, parity
# re-verified both SFs), `cur_classifier_train`/`cur_classifier_scored`
# (their full chain is transitively exercised by
# `cur_classifier_calibration`, IN this window, whose unrolled-CTE
# oracle recomputes train->score->calibrate end to end), and
# `text_bpe_merges`/`text_bpe_compression` and `mm_frame_sample`
# (untouched byte-level kernels since r5, green r8 rows, re-verified in
# the regenerated parity at both SFs — the least-risk rows to age one
# extra round).  Only ORACLE-CHECKED
# queries go in the window — a rows-only query would burn a slot on
# an err:"no_oracle" record.  Rotation reorders, never drops; the
# suite's own oracle tests still cover the full set.
_ROUND11_FRONT = [
    # (a) never-driver-checked + new/changed this round.  The round-11
    # SECOND session added five more oracle queries with no driver row
    # (`e_markov_transitions`, `text_collocations`, `emb_bitext_margin`,
    # `text_dup_window_profile`, `e_dau_hll`) and materially changed
    # `mm_image_decode` (gif_eq leg) — front-loaded here so the r11
    # snapshot checks them; six slots are yielded by five fixed-budget
    # recall audits and the coverage query noted below
    "dedup_paragraph_survivors", "sim_ivf_drift", "e_funnel",
    "e_retention", "sim_serving_ndcg", "dedup_paragraph", "mm_jpeg_decode",
    "e_markov_transitions", "text_collocations", "emb_bitext_margin",
    "text_dup_window_profile", "e_dau_hll", "mm_image_decode",
    # (b) the r8-stale cohort (newest driver row = r8), minus the two
    # classifier constituents covered via calibration's chained oracle
    "cur_classifier_calibration", "cur_cluster_split", "cur_topic_balance",
    "cur_vocab_hll", "cur_weighted_sample", "dedup_exact",
    "dedup_labels_incremental", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped", "emb_knn_classify", "f5_having_admission",
    "f7_min_distinct", "f_predicate_stack", "j1_event_psth",
    "j2_dim_enrichment", "m12_sign_alignment", "m1_cca_closed_form",
    "m4_pca_closed_form", "m6_glm_closed_form",
    "mm_metadata_profile", "mm_phash", "mm_phash_neardup",
    "ret_hybrid_rrf", "ret_mmr", "ret_rm3_expansion", "ret_snippets",
    "sim_ivf_ann", "sim_ivf_delete",
    "sim_ivf_incremental", "sim_ivf_recall",
    "sim_ivfpq_ann", "sim_ivfpq_rerank",
    "text_bm25_topk",
    "text_dup_spans", "text_fingerprint", "text_token_count",
    # slots yielded to the second-wave rows above:
    # `sim_ivf_delete_recall` / `sim_ivf_incremental_recall` /
    # `sim_ivfpq_recall` / `sim_ivfpq_rerank_recall` / `sim_lsh_recall`
    # (fixed-budget derivations over the SAME memoized truth/serving
    # relations whose producers stay in this window; all re-verified in
    # the regenerated parity at both SFs) and
    # `text_dup_ngram_coverage` (its span/cut siblings remain in the
    # window on the same shingle relation) — they rotate back in at r12
]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"rotation names unknown queries: {missing}"
    for d in (QUERIES, ORACLES):
        ordered = [n for n in front if n in d] + [n for n in d if n not in front]
        items = {n: d[n] for n in ordered}
        d.clear()
        d.update(items)


_rotate(_ROUND11_FRONT)

# r12 FRONT-LOAD LIST: the six rows that yielded r11 window slots
# (`sim_ivf_delete_recall`, `sim_ivf_incremental_recall`,
# `sim_ivfpq_recall`, `sim_ivfpq_rerank_recall`, `sim_lsh_recall`,
# `text_dup_ngram_coverage`), then the r9-stale cohort (the five
# earlier slot-yielders: `ret_hybrid_rrf_audit`,
# `cur_classifier_train`, `cur_classifier_scored`, `text_bpe_merges`,
# `text_bpe_compression`, `mm_frame_sample`) and the r9 rotation
# remainder.  (`text_longest_dup_substring` is rows-only by design —
# it never takes a window slot.)

__all__ = ["QUERIES", "ORACLES", "register"]
