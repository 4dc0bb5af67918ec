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

    spark = get_spark("bench")

    # Warm the JVM + parquet footers with one untimed pass of the flagship.
    QUERIES["j1_event_psth"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # pragma: no cover
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            timings[name] = float("nan")
            continue
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(v for v in timings.values() if v == v), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
