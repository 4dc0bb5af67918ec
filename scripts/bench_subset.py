"""Time a subset of registered queries with bench.py's methodology.

Usage::

    python scripts/bench_subset.py q1,q2,... [REPS]

Same discipline as bench.py: index build first, Arrow warmup, full-scan
table warm, then REPS (default 3) noop-sink timed runs per query.
Prints per-query rep times and min to stderr and a compact JSON line to
stdout.  This is the inner measurement loop for optimization work; the
round-end numbers still come from bench.py's full grid.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from oxford_data_pipeline_spark.plans import QUERIES
    from oxford_data_pipeline_spark.plans.curation import build_curation_index
    from oxford_data_pipeline_spark.plans.dedup import build_dedup_index
    from oxford_data_pipeline_spark.plans.retrieval import build_retrieval_index
    from oxford_data_pipeline_spark.plans.similarity import build_ann_index
    from oxford_data_pipeline_spark.plans.textops import build_text_models
    from oxford_data_pipeline_spark.session import get_spark
    from oxford_data_pipeline_spark.sources.catalog import TABLES, load_table

    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark("bench_subset")
    for fn in (build_dedup_index, build_ann_index, build_text_models,
               build_retrieval_index, build_curation_index):
        fn(spark, sf_dir)
    import pandas as _pd  # noqa: F401
    from pyspark.sql import functions as _F

    spark.range(64).withColumn("g", _F.col("id") % 8).groupBy("g").applyInPandas(
        lambda pdf: pdf.assign(n=len(pdf)), "id long, g long, n long"
    ).count()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    out: dict[str, dict] = {}
    for name in names:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"reps": times, "min": min(times)}
        print(f"{name}: {times} min={min(times)}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
