"""Capture .explain("formatted") for registered queries into text files.

Usage::

    python scripts/explain_capture.py OUTDIR [SUFFIX] [--only q1,q2]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` (default suffix ``before``) for
each selected query at $SPARK_GRAFT_SF_DIR (default sf0.1).  The judge
reads these to check plan claims (Exchange count, join strategy,
PushedFilters, BatchEvalPython/ArrowEvalPython nodes) against the code,
so the capture is the plan exactly as the bench executes it.

Queries that materialize eagerly during construction (localCheckpoint
sites) run those jobs at capture time; the index-build phase is run
first so memoized artifacts exist, mirroring bench.py.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    args = sys.argv[1:]
    assert args, "usage: explain_capture.py OUTDIR [SUFFIX] [--only q1,q2]"
    outdir = args[0]
    suffix = "before"
    only: list[str] | None = None
    rest = args[1:]
    while rest:
        if rest[0] == "--only":
            only = [q.strip() for q in rest[1].split(",") if q.strip()]
            rest = rest[2:]
        else:
            suffix = rest[0]
            rest = rest[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from oxford_data_pipeline_spark.plans import QUERIES
    from oxford_data_pipeline_spark.plans.curation import build_curation_index
    from oxford_data_pipeline_spark.plans.dedup import build_dedup_index
    from oxford_data_pipeline_spark.plans.retrieval import build_retrieval_index
    from oxford_data_pipeline_spark.plans.similarity import build_ann_index
    from oxford_data_pipeline_spark.plans.textops import build_text_models
    from oxford_data_pipeline_spark.session import get_spark

    spark = get_spark("explain_capture")
    for fn in (build_dedup_index, build_ann_index, build_text_models,
               build_retrieval_index, build_curation_index):
        fn(spark, sf_dir)

    names = only if only is not None else list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"unknown queries: {unknown}"
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
