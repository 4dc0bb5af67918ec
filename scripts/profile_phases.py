"""Split a query's wall time into CONSTRUCT / PLAN / EXECUTE phases.

Usage::

    python scripts/profile_phases.py q1,q2,... [REPS]

Same warmup discipline as bench.py (index build, Arrow warmup, table
scans), then for each query and rep:

- construct: calling the registered builder (py4j plan construction)
- plan:      forcing ``queryExecution().executedPlan()`` (analysis +
             optimization + physical planning, pre-AQE)
- execute:   the noop-sink write (AQE re-planning, codegen, run)

This attributes overhead-dominated sf0.1 rows to the phase that
actually burns the time (guide §1.1: find where the time goes before
changing anything).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    spark = get_spark("profile_phases")
    for fn in (build_dedup_index, build_ann_index, build_text_models,
               build_retrieval_index, build_curation_index):
        fn(spark, sf_dir)
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    out: dict[str, list[dict[str, float]]] = {}
    for name in names:
        fn = QUERIES[name]
        rows = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rows.append({
                "construct": round(t1 - t0, 4),
                "plan": round(t2 - t1, 4),
                "execute": round(t3 - t2, 4),
                "total": round(t3 - t0, 4),
            })
            print(f"{name}: {rows[-1]}", file=sys.stderr)
        out[name] = rows
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
