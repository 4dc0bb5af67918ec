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

    def run_all(target_sf_dir: str) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            try:
                df = fn(spark, target_sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # pragma: no cover
                print(f"bench query {name} failed: {exc}", file=sys.stderr)
                timings[name] = float("nan")
                continue
            timings[name] = round(time.perf_counter() - t0, 4)
        return timings

    timings = run_all(sf_dir)
    total = round(sum(v for v in timings.values() if v == v), 4)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Optional second scale factor for round-over-round attribution
    # (set SPARK_GRAFT_SECONDARY_SF_DIR=/root/testdata/sf0.01).
    sec_dir = os.environ.get("SPARK_GRAFT_SECONDARY_SF_DIR")
    if sec_dir:
        sec_match = re.search(r"sf([0-9.]+)", sec_dir)
        out["secondary_sf"] = float(sec_match.group(1)) if sec_match else None
        out["queries_secondary"] = run_all(sec_dir)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
