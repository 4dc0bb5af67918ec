"""Input-normalization heuristics the reference applies at ingest.

- seconds↔bins ×rate conversion: `t_approach.start_time` is sometimes
  recorded in seconds rather than 20 ms bins; the reference detects
  this per session and multiplies by the sampling rate
  (`Matlab_part/segment_mdl_to_trials.m:181-188`).
- session-date polymorphism: `session_date` may be `yymmdd` or
  `20yymmdd`; the session predicate accepts both
  (`segment_mdl_to_trials.m:117-135`, F1).
- bin→seconds display axis: t_sec = t · (1/rate), the linspace axis
  (`segment_mdl_to_trials.m:248`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_start_bins(
    events: DataFrame,
    series_extent: DataFrame,
    rate_hz: int = 50,
    start_col: str = "start_time",
) -> DataFrame:
    """Detect seconds-valued event times per session and convert to
    bins. Heuristic (as in the reference): if a session's max start
    time is far below the recording's bin extent (≤ extent/rate), the
    column is in seconds → multiply by rate and round.

    series_extent: (session, bin_hi) — max bin per session, a tiny
    aggregate broadcast onto the events.
    """
    per_session = events.groupBy("session").agg(
        F.max(start_col).alias("_max_start")
    )
    flagged = per_session.join(F.broadcast(series_extent), "session").select(
        "session",
        (F.col("_max_start") <= F.col("bin_hi") / rate_hz).alias("_is_seconds"),
    )
    return (
        events.join(F.broadcast(flagged), "session")
        .withColumn(
            "start_bin",
            F.when(
                F.col("_is_seconds"), F.round(F.col(start_col) * rate_hz, 0)
            )
            .otherwise(F.col(start_col))
            .cast("int"),
        )
        .drop("_is_seconds")
    )


def session_date_predicate(animal: str, date: str) -> Column:
    """F1 — `animal_id == a AND session_date IN (d, '20'+d)` with the
    century-prefix fallback."""
    return (F.col("animal_id") == animal) & F.col("session_date").isin(
        date, "20" + date
    )


def with_time_seconds(segmented: DataFrame, rate_hz: int = 50) -> Column | DataFrame:
    """Display axis: t_sec = t / rate (the reference's linspace
    [-1.5, 3.0] over 226 bins)."""
    return segmented.withColumn("t_sec", F.col("t") / F.lit(float(rate_hz)))
