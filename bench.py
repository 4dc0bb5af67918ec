"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else None

    from oxford_data_pipeline_spark.plans import QUERIES
    from oxford_data_pipeline_spark.session import get_spark
    from oxford_data_pipeline_spark.sources.catalog import TABLES, load_table

    spark = get_spark("bench")

    # Warmup, untimed: one flagship pass (JVM/codegen) plus a footer
    # read of every table, so no query's first-touch parquet metadata
    # cost is misattributed to that query's own timing.
    QUERIES["j1_event_psth"](spark, sf_dir).count()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).count()

    def run_once(name, fn, target_sf_dir: str) -> float:
        t0 = time.perf_counter()
        try:
            df = fn(spark, target_sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # pragma: no cover
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            return float("nan")
        return round(time.perf_counter() - t0, 4)

    def run_all(target_sf_dir: str, reps: int = 1) -> list[dict[str, float]]:
        runs = [dict() for _ in range(reps)]
        for name, fn in QUERIES.items():
            for r in range(reps):
                runs[r][name] = run_once(name, fn, target_sf_dir)
        return runs

    # Two timed repetitions per query: rep 1 ("queries", comparable
    # with earlier rounds) and a per-query min ("queries_min") that
    # filters one-off JIT/GC noise out of round-over-round deltas.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    runs = run_all(sf_dir, reps)
    timings = runs[0]
    qmin = {
        n: min((run[n] for run in runs if run[n] == run[n]), default=float("nan"))
        for n in timings
    }
    total = round(sum(v for v in timings.values() if v == v), 4)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": qmin,
        "value_min": round(sum(v for v in qmin.values() if v == v), 4),
        "sf": sf,
    }

    # Second scale factor for round-over-round attribution (default
    # sf0.01; set SPARK_GRAFT_SECONDARY_SF_DIR="" to disable).
    sec_dir = os.environ.get("SPARK_GRAFT_SECONDARY_SF_DIR", "/root/testdata/sf0.01")
    if sec_dir:
        sec_match = re.search(r"sf([0-9.]+)", sec_dir)
        out["secondary_sf"] = float(sec_match.group(1)) if sec_match else None
        out["queries_secondary"] = run_all(sec_dir, 1)[0]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
