"""Retrieval-stack walkthrough: the search surface end-to-end.

    python examples/run_retrieval_workflow.py [sf_dir] [output_dir]

Builds the maintained retrieval artifacts (postings + doc-length
tables), then runs the search queries the way a retrieval service
composes them — BM25 top-k, TF-IDF keywords, exact-phrase search,
dense/truncated ANN with recall audits, and the hybrid RRF fusion —
and writes result reports via the S6/S7 sinks.  Defaults to sf0.001
for a fast demo.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oxford_data_pipeline_spark.plans import QUERIES
from oxford_data_pipeline_spark.plans.retrieval import build_retrieval_index
from oxford_data_pipeline_spark.session import get_spark
from oxford_data_pipeline_spark.sources.sinks import (
    write_csv_report,
    write_json_report,
    write_text_summary,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="retrieval_")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("retrieval-workflow")

    def q(name):
        return QUERIES[name](spark, sf_dir)

    print("== index build (the amortized artifact) ==")
    counts = build_retrieval_index(spark, sf_dir)
    print(f"postings index: {counts}")

    print("== lexical search ==")
    write_csv_report(
        q("text_bm25_topk").orderBy("query_id", "rank"),
        os.path.join(out_dir, "bm25_topk"),
    )
    write_csv_report(
        q("text_tfidf_top_terms").orderBy("doc_id", "rank"),
        os.path.join(out_dir, "tfidf_keywords"),
    )
    write_csv_report(
        q("ret_phrase_search").orderBy("w1", "w2", "doc_id"),
        os.path.join(out_dir, "phrase_hits"),
    )

    print("== dense + truncated ANN (with audits) ==")
    write_csv_report(
        q("sim_ivfpq_rerank").orderBy("query_id", "rnk"),
        os.path.join(out_dir, "ann_serving"),
    )
    write_json_report(
        q("sim_matryoshka_recall").orderBy("query_id"),
        os.path.join(out_dir, "matryoshka_recall"),
    )

    print("== hybrid fusion ==")
    fused = q("ret_hybrid_rrf").orderBy("query_id", "fused_rank")
    write_csv_report(fused, os.path.join(out_dir, "hybrid_rrf"))
    write_text_summary(
        fused.limit(20),
        os.path.join(out_dir, "summary.txt"),
        title="hybrid retrieval sample (RRF of BM25 + dense legs)",
    )

    print("== round-8 serving extras ==")
    rm3 = q("ret_rm3_expansion")
    print("  RM3-expanded result rows:", rm3.count())
    snip = q("ret_snippets").orderBy("query_id", "doc_id").limit(3).collect()
    print("  snippet sample:", [(r["query_id"], r["doc_id"], r["snippet"][:40])
                                for r in snip])
    mmr = q("ret_mmr")
    print("  MMR diverse picks:", mmr.count(), "rows across",
          mmr.select("query_id").distinct().count(), "queries")
    dr = q("sim_ivf_delete_recall").agg({"recall": "avg"}).collect()[0][0]
    print(f"  recall after tombstone delete (live-only truth): {dr:.3f}")

    print(f"reports under {out_dir}")


if __name__ == "__main__":
    main()
