"""Streaming hybrid search end-to-end (round-7 verdict item 8): the
streaming twin of `ret_hybrid_rrf`.

    python examples/run_streaming_search.py [sf_dir] [work_dir]

One run drives the full online lifecycle:

1. BASE snapshot lands as files; `postings_stream` / `doclen_stream`
   (stateless per-doc kernels) and `ivf_assign_stream` (frozen
   base-trained quantizer) maintain the postings, doc-length, and
   inverted-list tables through checkpointed availableNow triggers.
2. A DELTA batch of documents+embeddings arrives as new files; the
   SAME streams restart on the SAME checkpoints and process ONLY the
   delta (the resume-from-checkpoint assertion: phase-2 appended rows
   are exactly the delta docs' rows, no base row is reprocessed).
3. The maintained tables are proven bit-identical to a from-scratch
   batch rebuild over base+delta (the index-closure assertion).
4. Queries stream in as (query_id, text) rows and are served
   foreachBatch with FUSED results: BM25 more-like-this over the
   maintained postings (the batch `bm25_rank` scorer — one code path
   online and offline) + an IVF dense leg probing the maintained
   inverted list (top-2 cells per query, exact cosine re-rank inside
   the probed cells — never a corpus scan), fused by RRF
   sum(1/(60+rank)) exactly as the batch plan fuses its legs.

Scale shape: every maintenance kernel is scan-local (no state store),
the serving probe touches |2 cells| of the corpus per query, and the
checkpoint makes delta ingestion incremental — the 100 TB posture is
the same one the batch index contracts pin, expressed online.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RRF_K = 60
_TOPK = 5
_N_PROBE = 2


def _await_all(*queries) -> None:
    for q in queries:
        q.awaitTermination()


def _run_maintenance(
    spark: SparkSession, src_docs: str, src_embs: str, work: str, centroids
) -> None:
    """(Re)start the three checkpointed availableNow maintenance
    streams against the current file snapshot and drain them."""
    from oxford_data_pipeline_spark.streaming.stream_ann import ivf_assign_stream
    from oxford_data_pipeline_spark.streaming.stream_retrieval import (
        doclen_stream,
        postings_stream,
    )

    doc_schema = "doc_id long, text string"
    emb_schema = "vec_id long, embedding array<float>"
    docs = spark.readStream.schema(doc_schema).parquet(src_docs)
    embs = spark.readStream.schema(emb_schema).parquet(src_embs)
    qs = [
        postings_stream(docs)
        .writeStream.format("parquet")
        .option("path", os.path.join(work, "postings"))
        .option("checkpointLocation", os.path.join(work, "chk_postings"))
        .trigger(availableNow=True)
        .start(),
        doclen_stream(docs)
        .writeStream.format("parquet")
        .option("path", os.path.join(work, "doclens"))
        .option("checkpointLocation", os.path.join(work, "chk_doclens"))
        .trigger(availableNow=True)
        .start(),
        ivf_assign_stream(embs, centroids)
        .writeStream.format("parquet")
        .option("path", os.path.join(work, "cells"))
        .option("checkpointLocation", os.path.join(work, "chk_cells"))
        .trigger(availableNow=True)
        .start(),
    ]
    _await_all(*qs)


def _dense_probe(
    spark: SparkSession,
    qembs: DataFrame,
    centroids: DataFrame,
    cells: DataFrame,
    embs: DataFrame,
) -> DataFrame:
    """IVF serving leg over the STREAM-MAINTAINED inverted list:
    per query, rank cells by centroid affinity, probe the top
    {_N_PROBE}, exact-cosine re-rank only the probed vectors."""
    cnorms = centroids.groupBy("cell").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("cn")
    )
    qlong = qembs.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode("embedding").alias("dim", "qv"),
    ).withColumn("qv", F.col("qv").cast("double"))
    qnorm = qlong.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("qn")
    )
    aff = (
        qlong.join(F.broadcast(centroids), "dim")
        .groupBy("query_id", "cell")
        .agg(F.sum(F.col("qv") * F.col("w")).alias("dot"))
        .join(F.broadcast(cnorms), "cell")
        .join(qnorm, "query_id")
        .select("query_id", "cell", (F.col("dot") / (F.col("qn") * F.col("cn"))).alias("aff"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.col("aff").desc(), F.col("cell"))
    probes = (
        aff.withColumn("crnk", F.row_number().over(wc))
        .filter(F.col("crnk") <= _N_PROBE)
        .select("query_id", "cell")
    )
    cand = (
        probes.join(cells.withColumnRenamed("vec_id", "cand_id"), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
    )
    vec = embs.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    ).withColumn("nrm", F.sqrt(F.expr("aggregate(v, 0D, (a, x) -> a + x * x)")))
    vq = vec.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("vq"), F.col("nrm").alias("nq")
    )
    vc = vec.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("vc"), F.col("nrm").alias("nc")
    )
    dot = F.expr("aggregate(zip_with(vq, vc, (a, b) -> a * b), 0D, (a, x) -> a + x)")
    scored = (
        cand.join(vq, "query_id")
        .join(vc, "cand_id")
        .select("query_id", "cand_id", (dot / (F.col("nq") * F.col("nc"))).alias("cosine"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TOPK)
        .select("query_id", "cand_id", "rnk")
    )


def _rrf_fuse(lex_top: DataFrame, dense_top: DataFrame) -> DataFrame:
    l, d = lex_top.alias("l"), dense_top.alias("d")
    fused = l.join(
        d,
        (F.col("l.query_id") == F.col("d.query_id"))
        & (F.col("l.cand_id") == F.col("d.cand_id")),
        "full_outer",
    ).select(
        F.coalesce("l.query_id", "d.query_id").alias("query_id"),
        F.coalesce("l.cand_id", "d.cand_id").alias("cand_id"),
        (
            F.coalesce(1.0 / (F.lit(float(_RRF_K)) + F.col("l.rnk")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(float(_RRF_K)) + F.col("d.rnk")), F.lit(0.0))
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("cand_id"))
    return fused.withColumn("fused_rank", F.row_number().over(wf))


def main(spark: SparkSession | None = None, sf_dir: str | None = None,
         work: str | None = None) -> dict:
    if spark is None:
        from oxford_data_pipeline_spark.session import get_spark

        spark = get_spark("streaming-search")
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    work = work or tempfile.mkdtemp(prefix="stream_search_")
    for sub in ("src_docs", "src_embs"):
        os.makedirs(os.path.join(work, sub), exist_ok=True)

    from oxford_data_pipeline_spark.plans.similarity import _trained_centroids
    from oxford_data_pipeline_spark.sources.catalog import load_table
    from oxford_data_pipeline_spark.streaming.stream_retrieval import (
        postings_stream as _ps,
    )

    docs_all = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    embs_all = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base_docs = docs_all.filter(F.col("doc_id") % 3 != 0)
    delta_docs = docs_all.filter(F.col("doc_id") % 3 == 0)
    base_embs = embs_all.filter(F.col("vec_id") % 3 != 0)
    delta_embs = embs_all.filter(F.col("vec_id") % 3 == 0)

    # frozen quantizer: trained ONCE on the base snapshot (FAISS-add
    # semantics — appends never retrain)
    base_long = base_embs.select(
        "vec_id", F.posexplode("embedding").alias("dim", "valf")
    ).withColumn("val", F.col("valf").cast("double")).drop("valf")
    base_norms = base_long.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    centroids = _trained_centroids(base_long, base_norms).localCheckpoint(eager=True)

    src_docs, src_embs = os.path.join(work, "src_docs"), os.path.join(work, "src_embs")

    # ---- phase 1: base snapshot lands ----
    base_docs.write.mode("append").parquet(src_docs)
    base_embs.write.mode("append").parquet(src_embs)
    _run_maintenance(spark, src_docs, src_embs, work, centroids)
    p1 = spark.read.parquet(os.path.join(work, "postings")).count()
    c1 = spark.read.parquet(os.path.join(work, "cells")).count()
    print(f"phase 1 (base): postings={p1} cells={c1}")

    # ---- phase 2: delta arrives; streams RESUME from checkpoints ----
    delta_docs.write.mode("append").parquet(src_docs)
    delta_embs.write.mode("append").parquet(src_embs)
    _run_maintenance(spark, src_docs, src_embs, work, centroids)
    postings = spark.read.parquet(os.path.join(work, "postings"))
    doclens = spark.read.parquet(os.path.join(work, "doclens"))
    cells = spark.read.parquet(os.path.join(work, "cells"))
    p2, c2 = postings.count(), cells.count()
    print(f"phase 2 (after delta): postings={p2} cells={c2}")

    # resume-from-checkpoint: phase 2 appended ONLY the delta docs'
    # rows — every doc_id appears once, base rows were not reprocessed
    dup_docs = (
        postings.groupBy("doc_id", "term").count().filter(F.col("count") > 1).count()
    )
    dup_cells = cells.groupBy("vec_id").count().filter(F.col("count") > 1).count()
    delta_only = p2 - p1
    delta_expected = _ps(delta_docs).count()
    assert dup_docs == 0 and dup_cells == 0, "checkpoint resume reprocessed rows"
    assert delta_only == delta_expected, (delta_only, delta_expected)
    print(f"resume-from-checkpoint OK: phase 2 appended exactly {delta_only} delta posting rows")

    # index closure: maintained tables == batch rebuild over base+delta
    batch_postings = _ps(docs_all)
    diff = postings.exceptAll(batch_postings).count() + batch_postings.exceptAll(postings).count()
    assert diff == 0, "maintained postings diverge from batch rebuild"
    print("index closure OK: maintained postings == batch rebuild")

    # ---- phase 3: serve fused queries over the maintained tables ----
    from oxford_data_pipeline_spark.plans.retrieval import bm25_rank
    from oxford_data_pipeline_spark.streaming.stream_search import query_terms

    qids = [r["doc_id"] for r in docs_all.select("doc_id").orderBy("doc_id").limit(3).collect()]
    queries = docs_all.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    qembs = embs_all.filter(F.col("vec_id").isin(qids))

    qsrc = os.path.join(work, "src_queries")
    queries.write.parquet(qsrc)

    def serve_stream(p, dl, cl) -> list:
        """Stream the query file through foreachBatch fused serving
        against the given maintained tables; return the fused rows."""
        results: list = []

        def serve(batch: DataFrame, batch_id: int) -> None:
            lex = bm25_rank(query_terms(batch), p, dl, topk=_TOPK).select(
                "query_id", F.col("doc_id").alias("cand_id"), F.col("rank").alias("rnk")
            )
            # dense leg serves THIS micro-batch's queries only (join
            # qembs against the batch ids) — fusing the static full
            # query set would re-emit every query's rows once per
            # micro-batch
            batch_qembs = qembs.join(
                batch.select(F.col("query_id").alias("vec_id")).distinct(), "vec_id"
            )
            dense = _dense_probe(spark, batch_qembs, centroids, cl, embs_all)
            fused = _rrf_fuse(lex, dense)
            results.extend(fused.collect())

        (
            spark.readStream.schema("query_id long, text string")
            .parquet(qsrc)
            .writeStream.foreachBatch(serve)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        assert results, "serving produced no fused rows"
        by_q: dict = {}
        for r in results:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, lst in by_q.items():
            ranks = sorted(x["fused_rank"] for x in lst)
            assert ranks == list(range(1, len(lst) + 1)), q
        return results

    results = serve_stream(postings, doclens, cells)
    by_q: dict = {}
    for r in results:
        by_q.setdefault(r["query_id"], []).append(r)
    print(f"served {len(results)} fused rows for {len(by_q)} queries")

    # ---- phase 4: tombstone CDC — deletes merge into the maintained
    # tables (dense: apply_ivf_tombstones anti-join; lexical: the SAME
    # postings-delta shape the text CDC uses, old_tf -> new_tf = 0) ----
    from oxford_data_pipeline_spark.plans.retrieval import apply_postings_delta
    from oxford_data_pipeline_spark.streaming.stream_ann import (
        apply_ivf_tombstones,
    )

    victims = sorted(
        {r["cand_id"] for r in results if r["cand_id"] not in qids}
    )[:2]
    assert victims, "no deletable candidate appeared in the fused results"
    tomb_src = os.path.join(work, "src_tombstones")
    spark.createDataFrame(
        [(int(v),) for v in victims], "vec_id long"
    ).write.parquet(tomb_src)

    live_tables = {"postings": postings, "doclens": doclens, "cells": cells}

    def apply_tomb(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)
        rm = batch.select(F.col("vec_id").alias("doc_id"))
        cur_p = live_tables["postings"]
        delta = cur_p.join(rm, "doc_id").select(
            "doc_id", "term", F.col("tf").alias("old_tf"),
            F.lit(0).cast("long").alias("new_tf"),
        )
        live_tables["postings"] = apply_postings_delta(cur_p, delta).localCheckpoint(
            eager=True
        )
        live_tables["doclens"] = (
            live_tables["doclens"].join(rm, "doc_id", "left_anti").localCheckpoint(
                eager=True
            )
        )
        live_tables["cells"] = apply_ivf_tombstones(
            live_tables["cells"], batch
        ).localCheckpoint(eager=True)

    (
        spark.readStream.schema("vec_id long")
        .parquet(tomb_src)
        .writeStream.foreachBatch(apply_tomb)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert live_tables["cells"].filter(F.col("vec_id").isin(victims)).count() == 0
    assert live_tables["postings"].filter(F.col("doc_id").isin(victims)).count() == 0
    print(f"tombstone CDC applied: deleted doc_ids {victims}")

    # ---- phase 5: delete-then-serve — a deleted doc must never
    # surface in fused results again, on either leg ----
    results_after = serve_stream(
        live_tables["postings"], live_tables["doclens"], live_tables["cells"]
    )
    served_after = {r["cand_id"] for r in results_after}
    assert not set(victims) & served_after, "deleted doc served after tombstone"
    by_q_after: dict = {}
    for r in results_after:
        by_q_after.setdefault(r["query_id"], []).append(r)
    assert set(by_q_after) == set(by_q), "delete changed the served query set"
    # every query that served a victim pre-delete must still be served
    # post-delete (deletion replaces results, never silences a query)
    hit_queries = {r["query_id"] for r in results if r["cand_id"] in victims}
    assert hit_queries and hit_queries <= set(by_q_after), hit_queries
    print(
        f"delete-then-serve OK: {len(results_after)} fused rows, "
        f"victims absent from all {len(by_q_after)} queries"
    )

    # ---- phase 6: drift poll — the scheduled decision of WHEN to run
    # the out-of-band quantizer retrain (`sim_ivf_retrain`).  One
    # aggregation over the maintained live cells table (post-append,
    # post-tombstone); no training, no probes.  Here a third of the
    # live corpus arrived after the quantizer was trained (the %3
    # delta split), so delta_frac > 0.2 and the trigger TRIPS — the
    # documented handoff is: retrain_due=1 → schedule
    # plans.similarity.sim_ivf_retrain out of band. ----
    from oxford_data_pipeline_spark.plans.similarity import ivf_drift_metrics

    drift = ivf_drift_metrics(
        live_tables["cells"].select("vec_id", "cell"),
        F.col("vec_id") % 3 == 0,
    ).collect()[0]
    assert drift["n_live"] == live_tables["cells"].count()
    assert drift["delta_frac"] > 0.2, drift
    assert drift["retrain_due"] == 1, drift
    print(
        "drift poll: n_live={n} cells={c} max_share={m} occ_skew={s}"
        " delta_frac={d} retrain_due={r} -> schedule sim_ivf_retrain"
        " out of band".format(
            n=drift["n_live"], c=drift["cells_occupied"],
            m=drift["max_share"], s=drift["occ_skew"],
            d=drift["delta_frac"], r=drift["retrain_due"],
        )
    )

    return {
        "postings": p2,
        "cells": c2,
        "delta_rows": delta_only,
        "queries_served": len(by_q),
        "fused_rows": len(results),
        "deleted": victims,
        "fused_rows_after_delete": len(results_after),
        "drift": {k: drift[k] for k in drift.asDict()},
        "work": work,
    }


if __name__ == "__main__":
    out = main(
        sf_dir=sys.argv[1] if len(sys.argv) > 1 else None,
        work=sys.argv[2] if len(sys.argv) > 2 else None,
    )
    print(out)
    if len(sys.argv) <= 2:
        shutil.rmtree(out["work"], ignore_errors=True)
