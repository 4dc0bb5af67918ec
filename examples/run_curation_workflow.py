"""Training-data curation walkthrough: the extension surface end-to-end.

    python examples/run_curation_workflow.py [sf_dir] [output_dir]

Runs the registered training-data queries the way a curation pipeline
composes them — corpus profiling, quality/language gates, the dedup
family, the composed curation pipeline, and the ANN index with its
recall audit — and writes the curated sample + reports via the S6/S7
sinks. Defaults to sf0.001 for a fast demo.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oxford_data_pipeline_spark.plans import QUERIES
from oxford_data_pipeline_spark.session import get_spark
from oxford_data_pipeline_spark.sources.sinks import (
    write_csv_report,
    write_json_report,
    write_text_summary,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curation_")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("curation-workflow")

    def q(name):
        return QUERIES[name](spark, sf_dir)

    print("== corpus profile ==")
    write_text_summary(
        q("cur_length_profile").orderBy("source"),
        os.path.join(out_dir, "length_profile.txt"),
        "Per-source token-length profile",
    )
    print("  sources:", q("cur_mixture_weights").count(),
          "| langid rows:", q("text_langid").count())

    print("== quality + admission gates ==")
    rep = q("cur_repetition")
    print("  admitted:", rep.filter("admitted").count(), "/", rep.count())
    print("  decontamination flags:", q("cur_decontaminate").count())
    c4 = q("cur_c4_heuristics")
    print("  C4 gate:", c4.filter("admitted").count(), "/", c4.count(),
          "| PII docs:", q("cur_pii_scrub").filter("has_pii").count())
    dup = q("text_dup_ngram_coverage")
    print("  boilerplate (dup-coverage > 0.5):",
          dup.filter("mostly_duplicated").count())

    print("== mixture + selection ==")
    print("  temperature grid rows:", q("cur_temperature_mix").count())
    dsir = q("cur_dsir_weights")
    top = dsir.orderBy(dsir.log_importance.desc()).limit(3).collect()
    print("  DSIR top target-like docs:",
          [(r["doc_id"], r["log_importance"]) for r in top])

    print("== dedup family ==")
    print("  exact:", q("dedup_exact").collect()[0].asDict())
    print("  minhash near-dup pairs:", q("dedup_minhash_lsh").count(),
          "| clusters:", q("dedup_clusters").filter("NOT is_survivor").count(),
          "removed")
    audit = q("dedup_lsh_audit").collect()[0]
    print(f"  LSH candidate audit: recall {audit['recall']:.3f}"
          f" precision {audit['precision']:.3f}"
          f" ({audit['n_hit']}/{audit['n_true']} true pairs reached)")
    incr = q("dedup_incremental")
    print("  incremental batch: ", incr.filter("is_neardup").count(),
          "near-dups among", incr.count(), "delta matches")

    print("== tokenizer ==")
    merges = q("text_bpe_merges").orderBy("rank").limit(5).collect()
    print("  top BPE merges:", [(r["left"], r["right"]) for r in merges])
    comp = q("text_bpe_compression").agg({"symbols_per_token": "avg"}).collect()[0][0]
    print(f"  mean symbols/token after 20 merges: {comp:.2f}")

    print("== sketch tier (constant-size summaries) ==")
    bloom = q("cur_bloom_prefilter")
    fp = bloom.agg({"n_false_pos": "sum"}).collect()[0][0]
    conf = bloom.agg({"n_confirmed": "sum"}).collect()[0][0]
    print(f"  Bloom pre-filter: {conf} confirmed, {fp} sketch FPs")
    cms = q("cur_term_cms").orderBy("term").collect()
    print("  CMS top-term estimates:",
          [(r["term"], r["exact_tf"], r["cms_est"]) for r in cms[:3]])

    print("== adaptive gates + monitoring ==")
    gate = q("cur_adaptive_quality_gate").orderBy("source").limit(3).collect()
    print("  per-source cuts:", [(r["source"], r["cut"]) for r in gate])
    drift = q("cur_corpus_drift").limit(3).collect()
    print("  top drifted terms:",
          [(r["term"], r["abs_shift"]) for r in drift])
    prov = q("cur_provenance").groupBy("verdict").count().collect()
    print("  provenance:", {r["verdict"]: r["count"] for r in prov})

    print("== selection + split (round-8 tier) ==")
    hll = q("cur_vocab_hll").collect()
    m = 256
    regs = {r["bucket"]: r["mreg"] for r in hll}
    est = (0.7213 / (1 + 1.079 / m)) * m * m / sum(
        2.0 ** -regs.get(b, 0) for b in range(m)
    )
    print(f"  HLL vocab estimate: {est:.0f} (256 registers)")
    ws = q("cur_weighted_sample").orderBy("rk").limit(3).collect()
    print("  A-ES weighted sample head:",
          [(r["doc_id"], r["n_chars"]) for r in ws])
    bal = q("cur_topic_balance")
    print("  topic balance: kept", bal.count(), "docs across",
          bal.select("cell").distinct().count(), "learned topics")
    split = q("cur_cluster_split").groupBy("split").count().collect()
    print("  leakage-guarded split:", {r["split"]: r["count"] for r in split})

    print("== serving tier extras ==")
    mmr = q("ret_mmr")
    print("  MMR diverse picks:", mmr.count(), "rows,",
          mmr.select("query_id").distinct().count(), "queries")
    post_del = q("sim_ivf_delete")
    print("  post-tombstone serving:", post_del.count(), "rows for",
          post_del.select("query_id").distinct().count(), "live queries")

    print("== composed curation pipeline ==")
    curated = q("cur_pipeline")
    write_csv_report(
        curated.orderBy("source", "rk"),
        os.path.join(out_dir, "curated_sample.csv"),
    )
    print("  curated sample rows:", curated.count())

    print("== embedding index + recall audit ==")
    write_json_report(
        q("sim_ivfpq_recall").orderBy("query_id"),
        os.path.join(out_dir, "ivfpq_recall.json"),
    )
    for nm, lbl in (
        ("sim_lsh_recall", "multi-table LSH"),
        ("sim_ivf_recall", "IVF (5-probe)"),
        ("sim_ivfpq_recall", "IVF-PQ ADC"),
        ("sim_ivfpq_rerank_recall", "IVF-PQ + exact re-rank"),
    ):
        rec = q(nm).agg({"recall": "avg"}).collect()[0][0]
        print(f"  {lbl} mean recall@k: {rec:.3f}")

    print("  outputs in:", out_dir)
    for f in sorted(os.listdir(out_dir)):
        print("   -", f)


if __name__ == "__main__":
    main()
