"""Event-analytics end-to-end: the clickstream workflow a product or
training-telemetry pipeline runs over the `events` table, batch and
streaming sides of the SAME semantics.

    python examples/run_event_analytics.py [sf_dir]

Phases:

1. BATCH REPORTS — the registered plans: gap sessionization
   (`a14_sessionize`), as-of view→purchase attribution
   (`j9_asof_join`), the ordered conversion funnel (`e_funnel`),
   weekly cohort retention (`e_retention`), the next-event Markov
   transition matrix (`e_markov_transitions`), weekly distinct
   users from MERGED daily HLL sketches (`e_dau_hll`), and the
   round-12 trio — multi-touch attribution (`e_attribution`),
   trailing-window anomaly flags (`e_rolling_anomaly`), and weekly
   quantiles off merged daily value histograms (`e_value_histogram`).
   Cross-plan invariants are asserted, not just printed: funnel
   stages are monotone; every Markov row-distribution sums to 1; the
   as-of gap is non-negative; the HLL merge is register-exact
   (mismatches 0) and its estimate brackets the exact count within
   25%; linear attribution credit conserves the attributed-conversion
   count; anomaly flags agree with their z-scores; the histogram
   merge is bucket-exact with ordered quantile estimates.
2. STREAMING TWINS — the same events replayed through the stateful
   operators in two checkpointed runs (a restart boundary in the
   middle): `transition_stream` deltas + the END-fold compaction must
   rebuild the batch Markov matrix EXACTLY, and `funnel_stage_stream`
   first-completion rows must reproduce the batch stage counts.  One
   semantics, two execution modes — the contract every streaming
   module in this engine pins.

Scale shape: every batch plan is one user_id exchange plus bounded
aggregations (the as-of/sessionize discipline); the streaming state is
O(1) per user; the HLL merge means DAU history travels as 256-register
sketches, never raw IDs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main(spark: SparkSession | None = None, sf_dir: str | None = None,
         work: str | None = None) -> dict:
    if spark is None:
        from oxford_data_pipeline_spark.session import get_spark

        spark = get_spark("event-analytics")
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    work = work or tempfile.mkdtemp(prefix="event_analytics_")

    from oxford_data_pipeline_spark.plans.eventops import (
        a14_sessionize,
        e_attribution,
        e_audience_overlap,
        e_cooccurrence_lift,
        e_dau_hll,
        e_funnel,
        e_interarrival,
        e_markov_transitions,
        e_path_topk,
        e_retention,
        e_rolling_anomaly,
        e_value_histogram,
        j9_asof_join,
    )
    from oxford_data_pipeline_spark.sources.catalog import load_table

    # ---- 1: batch reports with cross-plan invariants ----
    sessions = a14_sessionize(spark, sf_dir)
    n_sessions = sessions.count()
    assert n_sessions > 0

    asof = j9_asof_join(spark, sf_dir)
    n_attr = asof.count()
    assert asof.filter(F.col("gap_minutes") < 0).count() == 0

    funnel = {r["stage"]: r for r in e_funnel(spark, sf_dir).collect()}
    assert funnel[1]["n_users"] >= funnel[2]["n_users"] >= funnel[3]["n_users"]

    retention = e_retention(spark, sf_dir)
    base_cells = retention.filter("week_offset = 0")
    assert base_cells.filter(F.col("retention") != 1.0).count() == 0

    markov = e_markov_transitions(spark, sf_dir).collect()
    sums: dict = {}
    for r in markov:
        sums[r["from_state"]] = sums.get(r["from_state"], 0.0) + r["p"]
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values()), sums

    dau = e_dau_hll(spark, sf_dir).collect()
    for r in dau:
        assert r["merge_mismatches"] == 0
        assert abs(r["est_dau"] - r["exact_dau"]) <= 0.25 * r["exact_dau"]

    # round-12 trio: multi-touch attribution conserves linear credit
    # (sums to the attributed-conversion count up to rounding), the
    # anomaly pass only scores days with a >= 3-day baseline, and the
    # weekly value-histogram merge is bucket-exact with quantile
    # estimates inside the value range
    attr = e_attribution(spark, sf_dir).collect()
    n_linear = sum(r["linear_credit"] for r in attr)
    assert abs(n_linear - round(n_linear)) < 1e-3
    assert all(r["n_first"] <= r["n_touches"] for r in attr)

    anomalies = e_rolling_anomaly(spark, sf_dir).collect()
    assert all(
        (r["is_anomaly"] == 1) == (abs(r["z"]) > 2) for r in anomalies
    )

    hist = e_value_histogram(spark, sf_dir).collect()
    for r in hist:
        assert r["merge_mismatches"] == 0
        assert 0 <= r["p50_est"] <= r["p90_est"]

    # HLL set algebra: the union-sketch identity holds register-exact
    # for every type pair, and the estimates obey union subadditivity
    overlap = e_audience_overlap(spark, sf_dir).collect()
    assert all(r["merge_mismatches"] == 0 for r in overlap)
    assert all(r["est_union"] <= r["est_a"] + r["est_b"] for r in overlap)

    # round-13 trio: path mining ranks are dense and count-ordered
    # with a CROSS-PLAN bound (a 3-step path contains its leading
    # 1-step transition, so its count never exceeds that Markov
    # cell's); basket co-occurrence obeys n_ab <= min(n_a, n_b) with
    # positive lift; inter-arrival quantiles are ordered p50 <= p90
    # <= max
    paths = e_path_topk(spark, sf_dir).collect()
    assert [r["rank"] for r in paths] == list(range(1, len(paths) + 1))
    assert all(
        a["n_paths"] >= b["n_paths"] for a, b in zip(paths, paths[1:])
    )
    mcount = {(r["from_state"], r["to_state"]): r["n"] for r in markov}
    assert all(
        r["n_paths"] <= mcount[(r["s1"], r["s2"])] for r in paths
    )
    assert 0 < sum(r["share"] for r in paths) <= 1.0 + 1e-9

    cooc = e_cooccurrence_lift(spark, sf_dir).collect()
    assert all(r["n_ab"] <= min(r["n_a"], r["n_b"]) for r in cooc)
    assert all(r["lift"] > 0 and 0 < r["support"] <= 1 for r in cooc)

    gaps = e_interarrival(spark, sf_dir).collect()
    assert all(
        r["p50_minutes"] <= r["p90_minutes"] <= r["max_whole_minutes"] + 1
        for r in gaps
    )
    assert all(r["n_gaps"] > 0 for r in gaps)

    print(f"batch: {n_sessions} sessions, {n_attr} attributed purchases,"
          f" funnel {funnel[1]['n_users']}->{funnel[2]['n_users']}->"
          f"{funnel[3]['n_users']}, {len(markov)} transitions,"
          f" {len(dau)} weekly DAU rows (merge exact),"
          f" {len(attr)} attribution models, {len(anomalies)} scored"
          f" days, {len(hist)} weekly histograms (merge exact)")

    # ---- 2: streaming twins across a restart boundary ----
    from oxford_data_pipeline_spark.streaming.stream_eventops import (
        funnel_stage_stream,
        markov_matrix_from,
        transition_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pdf = ev.toPandas().sort_values(["ts", "event_id"])
    half = len(pdf) // 2
    src = os.path.join(work, "ev_stream")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, ts long, event_id long, event_type string"

    def run(plan, name):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .transform(plan)
            .writeStream.format("parquet")
            .option("path", os.path.join(work, f"{name}_out"))
            .option("checkpointLocation", os.path.join(work, f"{name}_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pdf.iloc[:half].to_parquet(os.path.join(src, "part1.parquet"))
    run(transition_stream, "trans")
    run(funnel_stage_stream, "funnel")
    pdf.iloc[half:].to_parquet(os.path.join(src, "part2.parquet"))
    run(transition_stream, "trans")
    run(funnel_stage_stream, "funnel")

    trans = spark.read.parquet(os.path.join(work, "trans_out"))
    last_events = ev.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts", "event_id")).alias("event_type")
    )
    streamed = sorted(
        map(tuple, markov_matrix_from(trans, last_events).collect())
    )
    assert streamed == sorted(map(tuple, (r for r in markov)))

    stages = spark.read.parquet(os.path.join(work, "funnel_out"))
    got = {
        r["stage"]: r["n"]
        for r in stages.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    assert got == {s: funnel[s]["n_users"] for s in funnel if funnel[s]["n_users"]}
    print("streaming: transition compaction == batch markov;"
          " funnel stage counts == batch funnel (restart-resumed)")

    return {
        "sessions": n_sessions,
        "attributed": n_attr,
        "funnel": [funnel[s]["n_users"] for s in sorted(funnel)],
        "transitions": len(markov),
        "weeks": len(dau),
        "work": work,
    }


if __name__ == "__main__":
    print(main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else None))
