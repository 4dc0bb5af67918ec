"""Event-stream batch operators over `events`: as-of join and
gap-based sessionization.

Spark has no native ASOF JOIN; the classic scalable composition is a
tagged union + one window pass — both sides union into a single
relation ordered by time within the join key, and a running
last-non-null carries the right side's latest value forward to each
left row.  ONE exchange on the join key, no join node at all, no
row-versus-row comparison: this is the 100 TB as-of shape (a
sort-merge range join would shuffle both sides AND pay a per-row
backward scan).

Sessionization is the same discipline: gap-flag + running sum inside a
(user) window assigns session ids in one pass; the per-session rollup
is an ordinary aggregation on the bounded (user, session) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.plans.registry import register
from oxford_data_pipeline_spark.sources.catalog import load_table

_MIN_NS = 60_000_000_000

# --------------------------------------------------------------------------
# J9 — as-of (backward) join: latest 'view' at or before each 'purchase'
# --------------------------------------------------------------------------
_ASOF_ORACLE = """
WITH tagged AS (
    SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type,
           CASE WHEN event_type = 'view' THEN epoch_ns(ts) END AS view_ts
    FROM events
    WHERE event_type IN ('view', 'purchase')
),
carried AS (
    SELECT user_id, event_id, ts_ns, event_type,
           last_value(view_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_ns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS prev_view_ts
    FROM tagged
)
SELECT event_id, user_id, ts_ns, prev_view_ts,
       (ts_ns - prev_view_ts) // 60000000000 AS gap_minutes
FROM carried
WHERE event_type = 'purchase' AND prev_view_ts IS NOT NULL
"""


@register("j9_asof_join", _ASOF_ORACLE)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join: for each purchase, the latest view by the
    same user at or before the purchase time, via tagged-union + one
    running last-non-null window — no join node, one exchange on
    user_id."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts_ns"),
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "prev_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return (
        carried.filter(
            (F.col("event_type") == "purchase") & F.col("prev_view_ts").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "ts_ns",
            "prev_view_ts",
            # DIV (not /-then-cast): double casts truncate in Spark but
            # round in DuckDB; integer division agrees everywhere
            F.expr("(ts_ns - prev_view_ts) DIV 60000000000").alias("gap_minutes"),
        )
    )


# --------------------------------------------------------------------------
# A14 — gap-based sessionization (batch form of the streaming operator)
# --------------------------------------------------------------------------
_SESSION_GAP_NS = 30 * _MIN_NS

_SESSIONIZE_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value,
           lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts_ns, value,
           CASE WHEN prev_ts IS NULL OR ts_ns - prev_ts > {_SESSION_GAP_NS}
                THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
assigned AS (
    SELECT user_id, ts_ns, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts_ns) AS t_start_ns,
       max(ts_ns) AS t_end_ns,
       (max(ts_ns) - min(ts_ns)) // 60000000000 AS duration_minutes,
       round(sum(value) * 100 + 0.01, 0) / 100 + 0 AS total_value
FROM assigned
GROUP BY 1, 2
"""


@register("a14_sessionize", _SESSIONIZE_ORACLE)
def a14_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, batch form (the streaming module's
    applyInPandasWithState operator as a pure window plan): a >30 min
    silence starts a new session.  Gap-flag + running sum assign
    session ids in one window pass over the user partition; the
    per-session rollup groups on the bounded (user, session) key.
    Same single exchange as the as-of join."""
    from oxford_data_pipeline_spark.functions.compat import round2

    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts_ns"),
        "value",
        F.when(
            F.lag("ts").over(wo).isNull()
            | ((F.col("ts") - F.lag("ts").over(wo)) > _SESSION_GAP_NS),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    # tie-break on event_id so the running sum's frame is identical in
    # every engine when two events share a timestamp
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = flagged.withColumn(
        "session_idx", F.sum("is_new").over(wrun).cast("long")
    )
    return assigned.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ns").alias("t_start_ns"),
        F.max("ts_ns").alias("t_end_ns"),
        F.expr("(max(ts_ns) - min(ts_ns)) DIV 60000000000").alias(
            "duration_minutes"
        ),
        round2(F.sum("value")).alias("total_value"),
    )


# --------------------------------------------------------------------------
# E-JSON — semi-structured property extraction + rollup
# --------------------------------------------------------------------------
# The `props` column is a JSON blob (the universal escape hatch for
# sparse event attributes).  Extraction is a scan-local expression
# (get_json_object stays in the JVM — no UDF), so the whole query is
# one map-side-combinable aggregation on event_type: at 100 TB the
# JSON parse cost is embarrassingly parallel and the shuffle carries
# only |event_types| x partial-agg rows.
_JSON_PROPS_ORACLE = """
WITH extracted AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           value
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       count(DISTINCT k) AS n_distinct_k,
       round(avg(k) * 1000000 + 0.01, 0) / 1000000 + 0 AS mean_k,
       round(CAST(median(k) AS DOUBLE) * 1000000 + 0.01, 0) / 1000000 + 0 AS p50_k,
       min(k) AS min_k,
       max(k) AS max_k,
       round(avg(CASE WHEN k >= 50 THEN 1.0 ELSE 0.0 END) * 1000000 + 0.01, 0) / 1000000 + 0 AS high_k_share,
       round(sum(CASE WHEN k >= 50 THEN value END) * 100 + 0.01, 0) / 100 + 0 AS high_k_value
FROM extracted
GROUP BY 1
"""


@register("e_json_props", _JSON_PROPS_ORACLE)
def e_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + per-type rollup: parse `props.k`
    JVM-side (get_json_object, no UDF) and aggregate in one
    map-side-combinable pass."""
    from oxford_data_pipeline_spark.functions.compat import round2, round6

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        "value",
    )
    high = F.col("k") >= 50
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.countDistinct("k").alias("n_distinct_k"),
        round6(F.avg("k")).alias("mean_k"),
        round6(F.percentile("k", F.lit(0.5))).alias("p50_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        round6(F.avg(F.when(high, 1.0).otherwise(0.0))).alias("high_k_share"),
        round2(F.sum(F.when(high, F.col("value")))).alias("high_k_value"),
    )
