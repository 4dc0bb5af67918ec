"""Result sinks (SURVEY §2.1 S5-S8).

S5 — the reference archives per-session results as HDF5 v7.3
(`single_session_oxford_CCA_mdl.m:308-321`); here: session-partitioned
parquet, the cluster-native archival format.
S6/S7 — text/JSON report writers (`oxford_GLM_CCA_coefficients_
extract.m:488-565`; `..._within_session.py:1326-1347`).
S8 — resume-from-disk caching (`single_session_oxford_CCA_mdl.m:
107-170`): idempotent per-partition overwrite, so re-running a job
re-does only the partitions it is asked to.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """S5 — archive a result table partitioned by its session-like key.

    `partitionOverwriteMode=dynamic` makes the write idempotent per
    partition (S8): overwriting session X never touches session Y, the
    Spark equivalent of the reference's skip-if-result-file-exists."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def existing_partitions(spark: SparkSession, path: str, col: str) -> set[str]:
    """S8 — discover already-computed partitions (the resume check)."""
    if not os.path.exists(path):
        return set()
    prefix = f"{col}="
    return {
        d[len(prefix):]
        for d in os.listdir(path)
        if d.startswith(prefix) and os.path.isdir(os.path.join(path, d))
    }


def incremental_write(
    df: DataFrame, path: str, partition_col: str, recompute: bool = False
) -> list[str]:
    """S8 — write only partitions not yet on disk (unless recompute).

    Returns the list of partition values written. The skip predicate is
    pushed into the plan, so skipped sessions are never even scanned.
    """
    spark = df.sparkSession
    done = set() if recompute else existing_partitions(spark, path, partition_col)
    todo_df = df if not done else df.filter(~F.col(partition_col).isin(*done))
    written = [
        r[0] for r in todo_df.select(partition_col).distinct().collect()
    ]
    if written:
        write_partitioned(todo_df, path, [partition_col])
    return sorted(map(str, written))


def write_json_report(df: DataFrame, path: str) -> None:
    """S7 — one JSON document per row (driver-side for small summaries)."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    with open(path, "w") as f:
        json.dump(rows, f, indent=2, sort_keys=True, default=str)


def write_csv_report(df: DataFrame, path: str) -> None:
    """S6 — deterministic tidy-CSV artifact of a small aggregate (the
    ready-to-plot figure tables).  The caller supplies row ordering;
    floats use Python's shortest-repr rendering, which round-trips
    exactly, and NULL renders as an empty field."""
    import csv

    rows = df.collect()
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(df.columns)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])


def write_text_summary(df: DataFrame, path: str, title: str) -> None:
    """S6 — human-readable summary report of a small aggregate."""
    rows = df.collect()
    cols = df.columns
    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) if rows else len(c) for c in cols}
    lines = [title, "=" * len(title), ""]
    lines.append("  ".join(c.ljust(widths[c]) for c in cols))
    lines.append("  ".join("-" * widths[c] for c in cols))
    for r in rows:
        lines.append("  ".join(str(r[c]).ljust(widths[c]) for c in cols))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
