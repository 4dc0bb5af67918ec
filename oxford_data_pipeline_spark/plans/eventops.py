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

from oxford_data_pipeline_spark.functions.compat import (
    EPOCH_DAY_SQL,
    EPOCH_WEEK_SQL,
    ORACLE_EPOCH_DAY_SQL,
    ORACLE_EPOCH_WEEK_SQL,
    floor_div_sql,
    oracle_floor_div_sql,
)
from oxford_data_pipeline_spark.plans.memo import bounded_once
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

# Shared session-assignment CTE chain (gap-flag + running sum): the
# single source of truth for what "a session" means in SQL, composed
# into both the A14 rollup oracle and the within-session
# co-occurrence oracle below (they must never drift on the gap rule).
_SESSION_ASSIGN_CTES = f"""
ordered AS (
    SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts_ns, value,
           lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, event_type, ts_ns, value,
           CASE WHEN prev_ts IS NULL OR ts_ns - prev_ts > {_SESSION_GAP_NS}
                THEN 1 ELSE 0 END AS is_new
    FROM ordered
),
assigned AS (
    SELECT user_id, event_type, ts_ns, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM flagged
)
"""

_SESSIONIZE_ORACLE = f"""
WITH {_SESSION_ASSIGN_CTES}
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts_ns) AS t_start_ns,
       max(ts_ns) AS t_end_ns,
       (max(ts_ns) - min(ts_ns)) // 60000000000 AS duration_minutes,
       round(sum(value) * 100 + 0.01, 0) / 100 + 0 AS total_value
FROM assigned
GROUP BY 1, 2
"""


def session_assignments(ev: DataFrame) -> DataFrame:
    """Gap-based session assignment (user_id, event_type, ts_ns,
    value, session_idx): gap-flag + running sum inside ONE window pass
    over the user partition — the Spark half of the shared
    `_SESSION_ASSIGN_CTES` definition, reused by A14's rollup and the
    within-session co-occurrence query so the gap rule can't drift."""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
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
    return flagged.withColumn(
        "session_idx", F.sum("is_new").over(wrun).cast("long")
    )


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
    assigned = session_assignments(ev)
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


# --------------------------------------------------------------------------
# E-FUNNEL — ordered conversion funnel (signup -> view -> purchase)
# --------------------------------------------------------------------------
# The classic product-analytics funnel with the ORDERING constraint
# (each stage must happen at-or-after the previous stage's first
# completion), computed the same way as the as-of join: ONE window
# pass per user carrying running first-completion timestamps — no
# self-joins, no per-stage scans.  At 100 TB this is one exchange on
# user_id plus a per-user flag aggregation; the output is 3 rows.
_FUNNEL_ORACLE = """
WITH ev AS (
    SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type
    FROM events WHERE event_type IN ('signup', 'view', 'purchase')
),
carried AS (
    SELECT user_id, event_type,
           min(CASE WHEN event_type = 'signup' THEN ts_ns END) OVER w AS s_ts,
           min(CASE WHEN event_type = 'view' THEN ts_ns END) OVER w AS raw_v_ts
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
staged AS (
    SELECT user_id,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS did_signup,
           max(CASE WHEN event_type = 'view' AND s_ts IS NOT NULL
                    THEN 1 ELSE 0 END) AS did_view,
           max(CASE WHEN event_type = 'purchase' AND s_ts IS NOT NULL
                        AND raw_v_ts IS NOT NULL AND raw_v_ts >= s_ts
                    THEN 1 ELSE 0 END) AS did_purchase
    FROM carried GROUP BY 1
),
tot AS (
    SELECT CAST(sum(did_signup) AS BIGINT) AS s1,
           CAST(sum(CASE WHEN did_signup = 1 AND did_view = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS s2,
           CAST(sum(CASE WHEN did_signup = 1 AND did_view = 1
                             AND did_purchase = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS s3
    FROM staged
)
SELECT 1 AS stage, 'signup' AS event_type, s1 AS n_users,
       round(1.0 * 1000000 + 0.01, 0) / 1000000 + 0 AS conv_from_prev
FROM tot
UNION ALL
SELECT 2, 'view', s2,
       round(CAST(s2 AS DOUBLE) / s1 * 1000000 + 0.01, 0) / 1000000 + 0
FROM tot WHERE s1 > 0
UNION ALL
SELECT 3, 'purchase', s3,
       round(CAST(s3 AS DOUBLE) / s2 * 1000000 + 0.01, 0) / 1000000 + 0
FROM tot WHERE s2 > 0
"""


@register("e_funnel", _FUNNEL_ORACLE)
def e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> purchase: a view
    counts only at-or-after the user's first signup, a purchase only
    at-or-after the first qualified view — the ordering carried by ONE
    running-min window pass per user (the as-of-join discipline: one
    exchange on user_id, no self-joins), then a per-user flag
    aggregation and a 3-row stage report with conversion rates."""
    from oxford_data_pipeline_spark.functions.compat import round6

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "user_id",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).over(w).alias("s_ts"),
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).over(w).alias("raw_v_ts"),
    )
    staged = carried.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "signup").cast("int")
        ).alias("did_signup"),
        F.max(
            (
                (F.col("event_type") == "view") & F.col("s_ts").isNotNull()
            ).cast("int")
        ).alias("did_view"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & F.col("s_ts").isNotNull()
                & F.col("raw_v_ts").isNotNull()
                & (F.col("raw_v_ts") >= F.col("s_ts"))
            ).cast("int")
        ).alias("did_purchase"),
    )
    tot = staged.agg(
        F.sum("did_signup").alias("s1"),
        F.sum(
            ((F.col("did_signup") == 1) & (F.col("did_view") == 1)).cast("int")
        ).alias("s2"),
        F.sum(
            (
                (F.col("did_signup") == 1)
                & (F.col("did_view") == 1)
                & (F.col("did_purchase") == 1)
            ).cast("int")
        ).alias("s3"),
    )
    rows = tot.select(
        F.expr(
            "stack(3,"
            " 1, 'signup', s1, CAST(NULL AS DOUBLE),"
            " 2, 'view', s2, CAST(s2 AS DOUBLE) / s1,"
            " 3, 'purchase', s3, CAST(s3 AS DOUBLE) / s2)"
            " AS (stage, event_type, n_users, conv_raw)"
        ),
        F.col("s1"),
        F.col("s2"),
    )
    return (
        rows.filter(
            (F.col("stage") == 1)
            | ((F.col("stage") == 2) & (F.col("s1") > 0))
            | ((F.col("stage") == 3) & (F.col("s2") > 0))
        )
        .select(
            "stage",
            "event_type",
            "n_users",
            round6(
                F.when(F.col("stage") == 1, F.lit(1.0)).otherwise(
                    F.col("conv_raw")
                )
            ).alias("conv_from_prev"),
        )
    )


# --------------------------------------------------------------------------
# E-RETENTION — weekly cohort retention matrix
# --------------------------------------------------------------------------
# Cohort analytics: users grouped by their first-activity week; each
# (cohort_week, week_offset) cell counts the cohort's users active
# that many weeks later, with the retention rate against the cohort
# size.  Scale shape: one per-user min aggregation, one DISTINCT on
# (user, week) — both map-side-combinable — and one equi-join back on
# user_id (co-partitioned with the aggregation's exchange); the cell
# matrix is bounded by weeks^2, so the rate join broadcasts.
_RETENTION_ORACLE = f"""
WITH weeks AS (
    SELECT user_id, {ORACLE_EPOCH_WEEK_SQL} AS week
    FROM events
),
firstw AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1),
active AS (SELECT DISTINCT user_id, week FROM weeks),
cells AS (
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM active a JOIN firstw f USING (user_id)
    GROUP BY 1, 2
),
base AS (
    SELECT cohort_week, n_users AS cohort_size FROM cells WHERE week_offset = 0
)
SELECT c.cohort_week, c.week_offset, c.n_users,
       round(CAST(c.n_users AS DOUBLE) / b.cohort_size * 1000000 + 0.01, 0)
           / 1000000 + 0 AS retention
FROM cells c JOIN base b USING (cohort_week)
"""


@register("e_retention", _RETENTION_ORACLE)
def e_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (see section comment): cohort =
    first-activity week; each cell = distinct users active at that
    week offset; retention = cell / cohort size (offset 0)."""
    from oxford_data_pipeline_spark.functions.compat import round6

    weeks = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(EPOCH_WEEK_SQL).alias("week")
    )
    firstw = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = weeks.distinct()
    cells = (
        active.join(firstw, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = cells.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return cells.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        round6(
            F.col("n_users").cast("double") / F.col("cohort_size")
        ).alias("retention"),
    )


# --------------------------------------------------------------------------
# E-GROWTH-ACCOUNTING — weekly new / retained / resurrected / churned
# --------------------------------------------------------------------------
# The growth-accounting decomposition over the SAME two relations the
# retention matrix uses (per-user first week + distinct (user, week)
# activity): each active (user, week) is exactly one of NEW (week =
# first week), RETAINED (active the previous week too) or RESURRECTED
# (returning after a gap); CHURNED(w) counts users active in w-1 but
# not w.  The quick ratio (new + resurrected) / churned summarizes
# whether growth outruns loss; NULL when nothing churned.  Scale
# shape: the distinct (user, week) projection is the only corpus-
# sized step — shared with `e_retention`, and in production BOTH
# reports serve from the SAME maintained retention state
# (`stream_eventops.growth_report_from` — one relation, two reports,
# like the daily-count state serving anomaly + seasonality); the
# previous-week and churn joins are co-partitioned on user_id, and
# the rollup is bounded by |weeks|.
_GROWTH_ORACLE = f"""
WITH weeks AS (
    SELECT user_id, {ORACLE_EPOCH_WEEK_SQL} AS week
    FROM events
),
firstw AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1),
active AS (SELECT DISTINCT user_id, week FROM weeks),
labeled AS (
    SELECT a.user_id, a.week,
           CASE WHEN a.week = f.cohort_week THEN 'new'
                WHEN p.user_id IS NOT NULL THEN 'retained'
                ELSE 'resurrected' END AS status
    FROM active a
    JOIN firstw f USING (user_id)
    LEFT JOIN active p
      ON p.user_id = a.user_id AND p.week = a.week - 1
),
per_week AS (
    SELECT week,
           count(*) AS n_active,
           sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS n_new,
           sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS n_retained,
           sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
               AS n_resurrected
    FROM labeled GROUP BY 1
),
churn AS (
    SELECT p.week + 1 AS week, count(*) AS n_churned
    FROM active p
    LEFT JOIN active c
      ON c.user_id = p.user_id AND c.week = p.week + 1
    WHERE c.user_id IS NULL
    GROUP BY 1
)
SELECT w.week,
       CAST(w.n_active AS BIGINT) AS n_active,
       CAST(w.n_new AS BIGINT) AS n_new,
       CAST(w.n_retained AS BIGINT) AS n_retained,
       CAST(w.n_resurrected AS BIGINT) AS n_resurrected,
       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned,
       CASE WHEN coalesce(ch.n_churned, 0) > 0 THEN
           round((w.n_new + w.n_resurrected)
                 / CAST(ch.n_churned AS DOUBLE) * 1000000 + 0.01, 0)
               / 1000000 + 0
       END AS quick_ratio
FROM per_week w LEFT JOIN churn ch USING (week)
"""


def growth_accounting_from(
    firstw: DataFrame, active: DataFrame
) -> DataFrame:
    """Read-time growth-accounting report from the (per-user first
    week, distinct (user, week) activity) relations — the SAME state
    the retention matrix derives from, shared by the batch query and
    the streaming retention maintainer so the status definitions
    can't drift."""
    from oxford_data_pipeline_spark.functions.compat import round6

    prev = active.select(
        "user_id",
        (F.col("week") + 1).alias("week"),
        F.lit(1).alias("was_prev"),
    )
    labeled = (
        active.join(
            firstw.select("user_id", "cohort_week"), "user_id"
        )
        .join(prev, ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("week") == F.col("cohort_week"), "new")
            .when(F.col("was_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    per_week = labeled.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum((F.col("status") == "new").cast("long")).alias("n_new"),
        F.sum((F.col("status") == "retained").cast("long")).alias(
            "n_retained"
        ),
        F.sum((F.col("status") == "resurrected").cast("long")).alias(
            "n_resurrected"
        ),
    )
    churn = (
        active.select("user_id", (F.col("week") + 1).alias("week"))
        .join(active, ["user_id", "week"], "left_anti")
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_churned_raw"))
    )
    churned = F.coalesce(F.col("n_churned_raw"), F.lit(0))
    return per_week.join(F.broadcast(churn), "week", "left").select(
        "week",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        churned.cast("bigint").alias("n_churned"),
        F.when(
            churned > 0,
            round6(
                (F.col("n_new") + F.col("n_resurrected"))
                / F.col("n_churned_raw").cast("double")
            ),
        ).alias("quick_ratio"),
    )


@register("e_growth_accounting", _GROWTH_ORACLE)
def e_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (see section comment): the retention
    state's two relations through the shared
    `growth_accounting_from` tail."""
    weeks = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(EPOCH_WEEK_SQL).alias("week")
    )
    firstw = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    active = weeks.distinct()
    return growth_accounting_from(firstw, active)


# --------------------------------------------------------------------------
# E-MARKOV — next-event transition matrix (path analysis)
# --------------------------------------------------------------------------
# The classic clickstream path model (reference analogue: the
# cross-session transition summaries of Cross_section_level/
# session_transitions; LLM-pipeline analogue: user-journey features):
# for every consecutive (event, next event) pair within a user's
# timeline, the transition count and the row-normalized probability.
# Scale shape: ONE exchange on user_id for the lead() window (the
# sessionize/as-of discipline — no self-join), then a hash aggregation
# on the tiny (from, to) state domain (map-side combinable to
# |states|^2 rows per task) and a broadcast join against the
# per-from-state totals.  Nothing here grows with corpus size except
# the single user_id exchange.
_MARKOV_ORACLE = """
WITH ordered AS (
    SELECT event_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
           ) AS nxt
    FROM events
),
counts AS (
    SELECT event_type AS from_state, coalesce(nxt, 'END') AS to_state,
           count(*) AS n
    FROM ordered GROUP BY 1, 2
),
totals AS (SELECT from_state, sum(n) AS n_from FROM counts GROUP BY 1)
SELECT c.from_state, c.to_state, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / t.n_from * 1000000 + 0.01, 0)
           / 1000000 + 0 AS p
FROM counts c JOIN totals t USING (from_state)
"""


@register("e_markov_transitions", _MARKOV_ORACLE)
def e_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event transition matrix (see section comment):
    lead() inside the user timeline, terminal transitions kept as
    'END', probabilities row-normalized per from-state."""
    from oxford_data_pipeline_spark.functions.compat import round6

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.select(
            F.col("event_type").alias("from_state"),
            F.coalesce(
                F.lead("event_type").over(w), F.lit("END")
            ).alias("to_state"),
        )
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("n_from"))
    return counts.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        round6(F.col("n").cast("double") / F.col("n_from")).alias("p"),
    )


# --------------------------------------------------------------------------
# E-DAU-HLL — time-partitioned distinct sketches with register merge
# --------------------------------------------------------------------------
# The sketch-mergeability story every 100 TB metrics pipeline relies
# on: per-DAY HyperLogLog register relations for distinct users
# (constant 256-bucket size per day, map-side-combinable max-agg
# maintenance — the `cur_vocab_hll` machinery keyed by time), then
# WEEKLY cardinalities obtained by MERGING the daily registers
# (bucket-wise max — associative, so merged registers are provably
# IDENTICAL to sketching the week directly; the query emits the
# full-outer mismatch count, 0 by construction, as the audited
# invariant).  The estimate uses the standard HLL formula with the
# small-range LinearCounting correction; the correction branch is
# taken on the ROUNDED raw estimate and the INTEGER zero-register
# count so both engines take the same branch.  Nothing here retains
# per-user state beyond the day's 256 registers: the merge means
# history can be kept as sketches, never raw IDs.
_DAU_ALPHA = "(0.7213 / (1 + 1.079 / 256))"

# shared SQL fragment: (bucket, rho) from an md5 hex column `h` —
# the oracle mirror of `user_hll_registers`, reused by the DAU and
# audience-overlap sketches
_RHO_SQL = """(strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
        CASE WHEN length(regexp_extract(substr(h, 3, 12), '^0*')) = 12
             THEN 49
             ELSE length(regexp_extract(substr(h, 3, 12), '^0*')) * 4
                + (4 - CASE WHEN strpos('0123456789abcdef',
                                 substr(h, 3 + length(regexp_extract(
                                     substr(h, 3, 12), '^0*')), 1)) - 1 >= 8
                            THEN 4
                            WHEN strpos('0123456789abcdef',
                                 substr(h, 3 + length(regexp_extract(
                                     substr(h, 3, 12), '^0*')), 1)) - 1 >= 4
                            THEN 3
                            WHEN strpos('0123456789abcdef',
                                 substr(h, 3 + length(regexp_extract(
                                     substr(h, 3, 12), '^0*')), 1)) - 1 >= 2
                            THEN 2
                            ELSE 1 END) + 1 END AS rho"""

_DAU_HLL_ORACLE = f"""
WITH ev AS (
    SELECT {ORACLE_EPOCH_WEEK_SQL} AS week,
           {ORACLE_EPOCH_DAY_SQL} AS day,
           user_id,
           md5(CAST(user_id AS VARCHAR)) AS h
    FROM events
),
rhos AS (
    SELECT week, day, user_id,
        {_RHO_SQL}
    FROM ev
),
daily AS (SELECT week, day, bucket, max(rho) AS mreg FROM rhos GROUP BY 1, 2, 3),
merged AS (SELECT week, bucket, max(mreg) AS mreg FROM daily GROUP BY 1, 2),
direct AS (SELECT week, bucket, max(rho) AS mreg FROM rhos GROUP BY 1, 2),
mm AS (
    SELECT coalesce(m.week, d.week) AS week,
           CAST(sum(CASE WHEN m.mreg IS DISTINCT FROM d.mreg
                         THEN 1 ELSE 0 END) AS BIGINT) AS merge_mismatches
    FROM merged m
    FULL OUTER JOIN direct d ON m.week = d.week AND m.bucket = d.bucket
    GROUP BY 1
),
est AS (
    SELECT week, count(*) AS occupied,
           sum(pow(2.0, -mreg)) AS sumpow
    FROM direct GROUP BY 1
),
ex AS (
    SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_dau
    FROM ev GROUP BY 1
),
calc AS (
    SELECT e.week, x.exact_dau, mm.merge_mismatches,
           256 - e.occupied AS zeros,
           round({_DAU_ALPHA} * 256 * 256 / (e.sumpow + (256 - e.occupied))
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS raw_r
    FROM est e
    JOIN ex x ON e.week = x.week
    JOIN mm ON e.week = mm.week
)
SELECT week, exact_dau,
       round(CASE WHEN raw_r <= 640 AND zeros > 0
                  THEN 256 * ln(CAST(256 AS DOUBLE) / zeros)
                  ELSE raw_r END * 1000000 + 0.01, 0) / 1000000 + 0 AS est_dau,
       merge_mismatches
FROM calc
"""


def user_hll_registers(ev: DataFrame, keys: list[str]) -> DataFrame:
    """(…keys, user_id) → the keyed (…keys, bucket, mreg) HLL register
    relation — the `cur_vocab_hll` rho machinery on user ids, shared
    by `e_dau_hll` (daily + direct-weekly sketches) and the streaming
    maintainer (`streaming/stream_eventops.py`), so online and offline
    registers can never drift."""
    h = F.md5(F.col("user_id").cast("string").cast("binary"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    tail = F.substring(h, 3, 12)
    v = F.conv(tail, 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(49)).otherwise(
        F.lit(49) - F.length(F.conv(tail, 16, 2))
    )
    return (
        ev.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").cast("int").alias("mreg"))
    )


def hll_estimate(regs: DataFrame, keys: list[str]) -> DataFrame:
    """keys + `est` from a (…keys, bucket, mreg) register relation —
    the standard 256-register HLL estimate with the LinearCounting
    small-range branch taken on the ROUNDED raw estimate and the
    INTEGER zero count (cross-engine-deterministic), shared by
    `e_dau_hll` and `e_audience_overlap`."""
    from oxford_data_pipeline_spark.functions.compat import round6

    est = regs.groupBy(*keys).agg(
        F.count("*").alias("occupied"),
        F.sum(F.pow(F.lit(2.0), -F.col("mreg"))).alias("sumpow"),
    )
    zeros = F.lit(256) - F.col("occupied")
    raw_r = round6(
        F.expr(_DAU_ALPHA) * 256 * 256 / (F.col("sumpow") + zeros)
    )
    return est.select(
        *keys,
        round6(
            F.when(
                (raw_r <= 640) & (zeros > 0),
                F.lit(256) * F.log(F.lit(256.0) / zeros),
            ).otherwise(raw_r)
        ).alias("est"),
    )


@register("e_dau_hll", _DAU_HLL_ORACLE)
def e_dau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users from MERGED daily HLL sketches (see
    section comment): bucket-wise max merge, audited register-exact
    against the direct weekly sketch, LinearCounting small-range
    correction on deterministic branch inputs."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(EPOCH_WEEK_SQL).alias("week"),
        F.expr(EPOCH_DAY_SQL).alias("day"),
        "user_id",
    )
    daily = user_hll_registers(ev, ["week", "day"])
    merged = daily.groupBy("week", "bucket").agg(F.max("mreg").alias("mreg"))
    direct = user_hll_registers(ev, ["week"])
    mm = (
        merged.select("week", "bucket", F.col("mreg").alias("m_mreg"))
        .join(
            direct.select("week", "bucket", F.col("mreg").alias("d_mreg")),
            ["week", "bucket"],
            "full_outer",
        )
        .groupBy("week")
        .agg(
            F.sum(
                (~F.col("m_mreg").eqNullSafe(F.col("d_mreg"))).cast("int")
            ).alias("merge_mismatches")
        )
    )
    est = hll_estimate(direct, ["week"])
    ex = ev.groupBy("week").agg(
        F.countDistinct("user_id").alias("exact_dau")
    )
    return (
        est.join(ex, "week")
        .join(mm, "week")
        .select(
            "week",
            "exact_dau",
            F.col("est").alias("est_dau"),
            "merge_mismatches",
        )
    )


# --------------------------------------------------------------------------
# E-ATTRIBUTION — multi-touch conversion attribution (first/last/linear)
# --------------------------------------------------------------------------
# The marketing-analytics / user-journey crediting op (LLM-pipeline
# analogue: provenance crediting of a kept document to the pipeline
# touches that preceded it): for each 'purchase', the 'view'/'click'
# touches by the same user within a 3-day lookback get credit under
# the three standard models — first-touch (earliest in window),
# last-touch (latest), and linear (1/k each across the k touches).
# Scale shape: the touch-conversion pairing is the J1 interval-join
# discipline — conversions explode to the two lookback-sized time bins
# an in-window touch can live in, the join is an EQUI-join on
# (user_id, bin) with the exact range as a post-filter (bounded
# candidates, co-partitioned), never a range-predicate theta-join; the
# per-conversion rank windows partition on conversion id (bounded by
# the lookback's touch count); the final rollup is a tiny
# per-touch-type aggregation.
_ATTR_LOOKBACK_NS = 3 * 86_400_000_000_000

_ATTRIBUTION_ORACLE = f"""
WITH conv AS (
    SELECT event_id AS conv_id, user_id, epoch_ns(ts) AS conv_ts
    FROM events WHERE event_type = 'purchase'
),
touch AS (
    SELECT event_id AS touch_id, user_id, event_type AS touch_type,
           epoch_ns(ts) AS touch_ts
    FROM events WHERE event_type IN ('view', 'click')
),
pairs AS (
    SELECT c.conv_id, t.touch_id, t.touch_type, t.touch_ts
    FROM conv c JOIN touch t USING (user_id)
    WHERE t.touch_ts <= c.conv_ts
      AND t.touch_ts > c.conv_ts - {_ATTR_LOOKBACK_NS}
),
ranked AS (
    SELECT conv_id, touch_id, touch_type,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY touch_ts, touch_id) AS rn_first,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY touch_ts DESC, touch_id DESC) AS rn_last,
           count(*) OVER (PARTITION BY conv_id) AS k
    FROM pairs
)
SELECT touch_type,
       count(*) AS n_touches,
       CAST(coalesce(sum(CASE WHEN rn_first = 1 THEN 1 END), 0) AS BIGINT)
           AS n_first,
       CAST(coalesce(sum(CASE WHEN rn_last = 1 THEN 1 END), 0) AS BIGINT)
           AS n_last,
       round(sum(1.0 / k) * 1000000 + 0.01, 0) / 1000000 + 0 AS linear_credit
FROM ranked
GROUP BY 1
"""


@register("e_attribution", _ATTRIBUTION_ORACLE)
def e_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution (see section comment): per touch type,
    the first-touch / last-touch conversion counts and the linear
    fractional credit over in-lookback touches, paired via the binned
    interval-join discipline (equi-join on (user_id, time bin), exact
    range as a post-filter)."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
        F.expr(f"ts DIV {_ATTR_LOOKBACK_NS}").alias("bin"),
    )
    # a touch in (conv_ts - L, conv_ts] lives in the conversion's bin
    # or the one before it — explode conversions to those two bins and
    # equi-join (the J1 event-window discipline; no theta-join)
    conv_bins = conv.withColumn(
        "bin",
        F.explode(
            F.array(
                F.expr(f"conv_ts DIV {_ATTR_LOOKBACK_NS}"),
                F.expr(f"conv_ts DIV {_ATTR_LOOKBACK_NS} - 1"),
            )
        ),
    )
    pairs = (
        conv_bins.join(touch, ["user_id", "bin"])
        .filter(
            (F.col("touch_ts") <= F.col("conv_ts"))
            & (F.col("touch_ts") > F.col("conv_ts") - _ATTR_LOOKBACK_NS)
        )
        .select("conv_id", "touch_id", "touch_type", "touch_ts")
    )
    return attribution_report_from(pairs)


def attribution_report_from(pairs: DataFrame) -> DataFrame:
    """Read-time attribution report over a (conv_id, touch_id,
    touch_type, touch_ts) pair relation — the rank-window + rollup
    tail shared by the batch query and the streaming pair-emitter
    twin (`stream_eventops.attribution_stream`)."""
    from oxford_data_pipeline_spark.functions.compat import round6

    wf = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    wl = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc()
    )
    wk = Window.partitionBy("conv_id")
    ranked = pairs.select(
        "touch_type",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count("*").over(wk).alias("k"),
    )
    return ranked.groupBy("touch_type").agg(
        F.count("*").alias("n_touches"),
        F.coalesce(
            F.sum(F.when(F.col("rn_first") == 1, 1)), F.lit(0)
        ).cast("bigint").alias("n_first"),
        F.coalesce(
            F.sum(F.when(F.col("rn_last") == 1, 1)), F.lit(0)
        ).cast("bigint").alias("n_last"),
        round6(F.sum(F.lit(1.0) / F.col("k"))).alias("linear_credit"),
    )


# --------------------------------------------------------------------------
# E-ROLLING-ANOMALY — trailing-window z-score over the daily rollup
# --------------------------------------------------------------------------
# Operational anomaly detection the way a metrics pipeline actually
# runs it at 100 TB: the raw stream collapses FIRST to the tiny
# (event_type, day) count grain (one map-side-combinable aggregation —
# the only corpus-sized step), and the trailing-baseline z-score runs
# as a window over that bounded relation (|types| x |days| rows), so
# the anomaly pass costs nothing at any corpus size.  Baseline = the
# previous 7 observed days (rows frame, >= 3 required); z is emitted
# on the rounded grid and the flag thresholds |z| > 2.
_ANOMALY_ORACLE = f"""
WITH daily AS (
    SELECT event_type, {ORACLE_EPOCH_DAY_SQL} AS day,
           count(*) AS n
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, day, n,
           avg(n) OVER w AS mean7,
           stddev_samp(n) OVER w AS sd7,
           count(*) OVER w AS n_base
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n,
       round(mean7 * 1000000 + 0.01, 0) / 1000000 + 0 AS mean7,
       round((n - mean7) / sd7 * 1000000 + 0.01, 0) / 1000000 + 0 AS z,
       CAST(abs((n - mean7) / sd7) > 2 AS INT) AS is_anomaly
FROM stats
WHERE n_base >= 3 AND sd7 > 0
"""


def anomaly_scores_from(daily: DataFrame) -> DataFrame:
    """Read-time z-score derivation over a maintained (event_type,
    day, n) count relation — shared by the batch query and the
    streaming count-maintainer twin (`stream_eventops`)."""
    from oxford_data_pipeline_spark.functions.compat import round6

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        "n",
        F.avg("n").over(w).alias("mean7"),
        F.stddev_samp("n").over(w).alias("sd7"),
        F.count("*").over(w).alias("n_base"),
    )
    z = (F.col("n") - F.col("mean7")) / F.col("sd7")
    return stats.filter((F.col("n_base") >= 3) & (F.col("sd7") > 0)).select(
        "event_type",
        "day",
        "n",
        round6(F.col("mean7")).alias("mean7"),
        round6(z).alias("z"),
        (F.abs(z) > 2).cast("int").alias("is_anomaly"),
    )


@register("e_rolling_anomaly", _ANOMALY_ORACLE)
def e_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags on the per-type daily
    count series (see section comment): aggregate to day grain first,
    then one bounded window per event type."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.expr(EPOCH_DAY_SQL).alias("day")
        )
        .agg(F.count("*").alias("n"))
    )
    return anomaly_scores_from(daily)


# --------------------------------------------------------------------------
# E-VALUE-HISTOGRAM — mergeable fixed-boundary histograms + quantiles
# --------------------------------------------------------------------------
# The quantile-monitoring twin of e_dau_hll's mergeability story:
# per-DAY fixed-boundary histograms of the event `value` (20 buckets
# of width 25, top bucket clamped — constant size per day, maintained
# by one map-side-combinable count aggregation), merged into WEEKS by
# bucket-wise SUM (associative and EXACT — unlike quantile digests,
# fixed-boundary counts lose nothing in the merge; the full-outer
# mismatch count against sketching the week directly is emitted as
# the audited invariant, 0 by construction).  Weekly p50/p90 are then
# estimated from the merged counts by linear interpolation inside the
# holding bucket — the error bound is the bucket width, chosen at
# write time, and history travels as 20-row relations, never raw
# values.
_HIST_W = 25.0
_HIST_TOP = 19

_VALUE_HIST_ORACLE = f"""
WITH base AS (
    SELECT {ORACLE_EPOCH_DAY_SQL} AS day,
           {oracle_floor_div_sql(ORACLE_EPOCH_DAY_SQL, 7)} AS week,
           least({_HIST_TOP}, CAST(floor(value / {_HIST_W}) AS INT)) AS bucket
    FROM events
),
daily AS (
    SELECT day, week, bucket, count(*) AS n FROM base GROUP BY 1, 2, 3
),
merged AS (
    SELECT week, bucket, sum(n) AS n FROM daily GROUP BY 1, 2
),
direct AS (
    SELECT week, bucket, count(*) AS n FROM base GROUP BY 1, 2
),
mm AS (
    SELECT coalesce(m.week, d.week) AS week,
           CAST(coalesce(sum(CASE WHEN m.n IS DISTINCT FROM d.n
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS merge_mismatches
    FROM merged m FULL OUTER JOIN direct d
      ON m.week = d.week AND m.bucket = d.bucket
    GROUP BY 1
),
tot AS (SELECT week, sum(n) AS n_total FROM merged GROUP BY 1),
cum AS (
    SELECT m.week, m.bucket, m.n,
           sum(m.n) OVER (PARTITION BY m.week ORDER BY m.bucket) AS c,
           t.n_total
    FROM merged m JOIN tot t USING (week)
),
est AS (
    -- the holding bucket is the ONE where the cumulative count
    -- crosses the target (c >= target and the cumulative before the
    -- bucket is still below it); interpolate linearly inside it
    SELECT week, n_total,
           min(CASE WHEN c >= 0.5 * n_total AND c - n < 0.5 * n_total THEN
               bucket * {_HIST_W} + {_HIST_W} * (0.5 * n_total - (c - n)) / n
               END) AS p50_est,
           min(CASE WHEN c >= 0.9 * n_total AND c - n < 0.9 * n_total THEN
               bucket * {_HIST_W} + {_HIST_W} * (0.9 * n_total - (c - n)) / n
               END) AS p90_est
    FROM cum GROUP BY 1, 2
)
SELECT e.week, CAST(e.n_total AS BIGINT) AS n_total,
       round(e.p50_est * 1000000 + 0.01, 0) / 1000000 + 0 AS p50_est,
       round(e.p90_est * 1000000 + 0.01, 0) / 1000000 + 0 AS p90_est,
       mm.merge_mismatches
FROM est e JOIN mm USING (week)
"""


def value_hist_buckets(events: DataFrame) -> DataFrame:
    """(day, week, bucket) rows for the fixed-boundary histogram —
    the shared bucketing of the batch query and the streaming
    histogram maintainer."""
    return events.select(
        F.expr(EPOCH_DAY_SQL).alias("day"),
        F.expr(floor_div_sql(EPOCH_DAY_SQL, 7)).alias("week"),
        F.least(
            F.lit(_HIST_TOP),
            F.floor(F.col("value") / _HIST_W).cast("int"),
        ).alias("bucket"),
    )


def weekly_quantiles_from(merged: DataFrame) -> DataFrame:
    """Read-time weekly (n_total, p50_est, p90_est) derivation over a
    merged (week, bucket, n) histogram relation — linear interpolation
    inside the holding bucket (the one where the cumulative count
    crosses the target).  Shared by the batch query and the streaming
    maintainer twin; estimates left unrounded for the caller."""
    tot = merged.groupBy("week").agg(F.sum("n").alias("n_total"))
    wc = Window.partitionBy("week").orderBy("bucket")
    cum = (
        merged.join(F.broadcast(tot), "week")
        .withColumn("c", F.sum("n").over(wc))
    )

    def interp(q: float):
        target = F.lit(q) * F.col("n_total")
        return F.min(
            F.when(
                (F.col("c") >= target)
                & (F.col("c") - F.col("n") < target),
                F.col("bucket") * _HIST_W
                + _HIST_W * (target - (F.col("c") - F.col("n"))) / F.col("n"),
            )
        )

    return cum.groupBy("week", "n_total").agg(
        interp(0.5).alias("p50_est"), interp(0.9).alias("p90_est")
    )


@register("e_value_histogram", _VALUE_HIST_ORACLE)
def e_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly quantile estimates off merged per-day fixed-boundary
    histograms, with the bucket-wise merge-exactness invariant emitted
    as an audited column (see section comment)."""
    from oxford_data_pipeline_spark.functions.compat import round6

    base = value_hist_buckets(load_table(spark, sf_dir, "events"))
    daily = base.groupBy("day", "week", "bucket").agg(F.count("*").alias("n"))
    merged = daily.groupBy("week", "bucket").agg(F.sum("n").alias("n"))
    direct = base.groupBy("week", "bucket").agg(F.count("*").alias("n"))
    mm = (
        merged.withColumnRenamed("n", "m_n")
        .join(
            direct.withColumnRenamed("n", "d_n"),
            ["week", "bucket"],
            "full_outer",
        )
        .groupBy("week")
        .agg(
            F.coalesce(
                F.sum(
                    (~F.col("m_n").eqNullSafe(F.col("d_n"))).cast("int")
                ),
                F.lit(0),
            ).cast("bigint").alias("merge_mismatches")
        )
    )
    est = weekly_quantiles_from(merged)
    return est.join(F.broadcast(mm), "week").select(
        "week",
        F.col("n_total").cast("bigint").alias("n_total"),
        round6(F.col("p50_est")).alias("p50_est"),
        round6(F.col("p90_est")).alias("p90_est"),
        "merge_mismatches",
    )


# --------------------------------------------------------------------------
# E-AUDIENCE-OVERLAP — HLL set algebra (inclusion-exclusion intersection)
# --------------------------------------------------------------------------
# The second half of the sketch-mergeability story: HLL registers
# support UNION exactly (bucket-wise max), so the intersection of two
# audiences estimates by inclusion-exclusion —
# |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B) — without ever joining user
# sets.  Per event-type pair: the three estimates (shared
# `hll_estimate` with its deterministic LinearCounting branch over
# the shared `user_hll_registers` builder), the clamped-at-zero
# overlap estimate, the EXACT overlap as the audit column, and the
# union-sketch identity as the audited invariant — registers merged
# max-wise from the two per-type sketches must equal sketching the
# union of raw events directly (0 mismatches by associativity,
# computed from both paths for real).  At 100 TB audiences travel as
# 256-register relations; the pair table is |types|² rows.
_OVERLAP_ORACLE = f"""
WITH ev AS (
    SELECT DISTINCT event_type, user_id,
           md5(CAST(user_id AS VARCHAR)) AS h
    FROM events
),
rhos AS (
    SELECT event_type, user_id,
        {_RHO_SQL}
    FROM ev
),
tregs AS (
    SELECT event_type, bucket, max(rho) AS mreg FROM rhos GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM ev),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM types a JOIN types b ON a.event_type < b.event_type
),
uregs AS (
    SELECT p.type_a, p.type_b, r.bucket, max(r.mreg) AS mreg
    FROM pairs p JOIN tregs r ON r.event_type IN (p.type_a, p.type_b)
    GROUP BY 1, 2, 3
),
udirect AS (
    SELECT p.type_a, p.type_b, r.bucket, max(r.rho) AS mreg
    FROM pairs p JOIN rhos r ON r.event_type IN (p.type_a, p.type_b)
    GROUP BY 1, 2, 3
),
mm AS (
    SELECT coalesce(u.type_a, d.type_a) AS type_a,
           coalesce(u.type_b, d.type_b) AS type_b,
           CAST(sum(CASE WHEN u.mreg IS DISTINCT FROM d.mreg
                         THEN 1 ELSE 0 END) AS BIGINT) AS merge_mismatches
    FROM uregs u
    FULL OUTER JOIN udirect d
      ON u.type_a = d.type_a AND u.type_b = d.type_b AND u.bucket = d.bucket
    GROUP BY 1, 2
),
sides AS (
    SELECT p.type_a, p.type_b, 'a' AS side, r.bucket, r.mreg
    FROM pairs p JOIN tregs r ON r.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, 'b' AS side, r.bucket, r.mreg
    FROM pairs p JOIN tregs r ON r.event_type = p.type_b
    UNION ALL
    SELECT type_a, type_b, 'u' AS side, bucket, mreg FROM uregs
),
calc AS (
    SELECT type_a, type_b, side, count(*) AS occupied,
           sum(pow(2.0, -mreg)) AS sumpow
    FROM sides GROUP BY 1, 2, 3
),
ests AS (
    SELECT type_a, type_b, side,
           round(CASE WHEN round({_DAU_ALPHA} * 256 * 256
                            / (sumpow + (256 - occupied))
                            * 1000000 + 0.01, 0) / 1000000 + 0 <= 640
                       AND 256 - occupied > 0
                  THEN 256 * ln(CAST(256 AS DOUBLE) / (256 - occupied))
                  ELSE round({_DAU_ALPHA} * 256 * 256
                             / (sumpow + (256 - occupied))
                             * 1000000 + 0.01, 0) / 1000000 + 0 END
                 * 1000000 + 0.01, 0) / 1000000 + 0 AS est
    FROM calc
),
wide AS (
    SELECT type_a, type_b,
           max(CASE WHEN side = 'a' THEN est END) AS est_a,
           max(CASE WHEN side = 'b' THEN est END) AS est_b,
           max(CASE WHEN side = 'u' THEN est END) AS est_union
    FROM ests GROUP BY 1, 2
),
exact AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS exact_overlap
    FROM (SELECT DISTINCT event_type, user_id FROM events) a
    JOIN (SELECT DISTINCT event_type, user_id FROM events) b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT w.type_a, w.type_b, w.est_a, w.est_b, w.est_union,
       round(greatest(0.0, w.est_a + w.est_b - w.est_union)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS est_overlap,
       coalesce(x.exact_overlap, 0) AS exact_overlap,
       mm.merge_mismatches
FROM wide w
JOIN mm ON w.type_a = mm.type_a AND w.type_b = mm.type_b
LEFT JOIN exact x ON w.type_a = x.type_a AND w.type_b = x.type_b
"""


@register("e_audience_overlap", _OVERLAP_ORACLE)
def e_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience intersection per event-type pair by HLL
    inclusion-exclusion (see section comment): union registers merge
    max-wise from the per-type sketches (identity vs the direct union
    sketch emitted as the audited invariant), estimates share the
    deterministic `hll_estimate` branch, exact overlap rides along as
    the audit column."""
    from oxford_data_pipeline_spark.functions.compat import round6

    # The distinct (event_type, user_id) audience relation is an
    # AGGREGATE of the corpus (bounded by |users| x |types|, never the
    # event count) and is referenced FOUR times — the per-type register
    # sketch, the direct-union sketch, and both sides of the
    # exact-overlap audit join.  r14 left it lazy, so every reference
    # re-scanned events and re-ran the distinct shuffle (4 corpus
    # passes); materializing it once (r15) costs one distinct pass and
    # three bounded reads — strictly fewer corpus scans at any scale.
    ev = bounded_once(
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    # The per-type register sketch is BOUNDED (|types| x <=256 rows) and
    # referenced by four downstream subtrees (uregs, est_a, est_b, and
    # the types grid); materializing it once stops each reference from
    # re-running the register aggregation.
    # LAZY checkpoint (r15): same plan truncation, no separate eager
    # materialization job at construction — see memo.bounded_once
    tregs = bounded_once(user_hll_registers(ev, ["event_type"]))
    # every type has >= 1 user, hence >= 1 register row — same set as
    # distinct(event_type) over the corpus, read from the bounded sketch
    types = tregs.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    pa = F.broadcast(pairs)
    # merged-union registers: bounded (|types|^2 x <=256 rows) and read
    # twice below (mismatch audit + union estimate) — materialized once
    uregs = bounded_once(
        pa.join(
            tregs,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("mreg").alias("mreg"))
    )
    # direct union sketch recomputed from the raw (type, user) rows —
    # the independent second path of the audited identity
    udirect = (
        pa.join(
            ev,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .select("type_a", "type_b", "user_id")
    )
    udregs = user_hll_registers(udirect, ["type_a", "type_b"])
    mm = (
        uregs.select("type_a", "type_b", "bucket", F.col("mreg").alias("m_mreg"))
        .join(
            udregs.select(
                "type_a", "type_b", "bucket", F.col("mreg").alias("d_mreg")
            ),
            ["type_a", "type_b", "bucket"],
            "full_outer",
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                (~F.col("m_mreg").eqNullSafe(F.col("d_mreg"))).cast("int")
            ).cast("bigint").alias("merge_mismatches")
        )
    )
    est_a = (
        hll_estimate(
            pa.join(tregs, F.col("event_type") == F.col("type_a")),
            ["type_a", "type_b"],
        ).withColumnRenamed("est", "est_a")
    )
    est_b = (
        hll_estimate(
            pa.join(tregs, F.col("event_type") == F.col("type_b")),
            ["type_a", "type_b"],
        ).withColumnRenamed("est", "est_b")
    )
    est_u = hll_estimate(uregs, ["type_a", "type_b"]).withColumnRenamed(
        "est", "est_union"
    )
    exact = (
        ev.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            ev.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_overlap"))
    )
    keys = ["type_a", "type_b"]
    return (
        est_a.join(est_b, keys)
        .join(est_u, keys)
        .join(mm, keys)
        .join(exact, keys, "left")
        .select(
            *keys,
            "est_a",
            "est_b",
            "est_union",
            round6(
                F.greatest(
                    F.lit(0.0),
                    F.col("est_a") + F.col("est_b") - F.col("est_union"),
                )
            ).alias("est_overlap"),
            F.coalesce(F.col("exact_overlap"), F.lit(0)).alias("exact_overlap"),
            "merge_mismatches",
        )
    )


# --------------------------------------------------------------------------
# E-PATH-TOPK — top-k 3-step event-type paths (sequence mining)
# --------------------------------------------------------------------------
# The n-step generalization of e_markov_transitions' 1-step matrix:
# the most-travelled (type → type → type) paths over each user's
# time-ordered event stream.  Path extraction is ONE window pass over
# the user partition (two leads — same single exchange as the as-of
# join / sessionize family); the triple histogram then collapses
# map-side to at most |types|^3 keys, so the ranking window runs on a
# bounded relation no matter the corpus size.  Top-k is rank-with-
# deterministic-tie-break (count desc, then path lexicographic), never
# a driver-side sort.
_PATH_K = 10

_PATH_TOPK_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type AS s1,
           lead(event_type, 1) OVER w AS s2,
           lead(event_type, 2) OVER w AS s3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
),
paths AS (
    SELECT s1, s2, s3, count(*) AS n_paths
    FROM seq WHERE s3 IS NOT NULL
    GROUP BY 1, 2, 3
),
tot AS (SELECT sum(n_paths) AS n_total FROM paths),
ranked AS (
    SELECT s1, s2, s3, n_paths,
           row_number() OVER (ORDER BY n_paths DESC, s1, s2, s3) AS rank
    FROM paths
)
SELECT r.rank, r.s1, r.s2, r.s3, r.n_paths,
       round(r.n_paths / t.n_total * 1000000 + 0.01, 0) / 1000000 + 0 AS share
FROM ranked r CROSS JOIN tot t
WHERE r.rank <= {_PATH_K}
"""


def path_topk_report_from(paths: DataFrame) -> DataFrame:
    """Read-time top-k derivation over a (s1, s2, s3, n_paths) triple
    count relation — shared by the batch query and the streaming
    triple-count maintainer (`stream_eventops.path_triple_stream`) so
    the rank/share definition can't drift.  The input is bounded by
    |types|^3 keys, so the single-partition rank window and the
    broadcast 1-row total are bounded, not corpus-sized."""
    from oxford_data_pipeline_spark.functions.compat import round6

    tot = paths.agg(F.sum("n_paths").alias("n_total"))
    wr = Window.orderBy(
        F.col("n_paths").desc(), F.col("s1"), F.col("s2"), F.col("s3")
    )
    ranked = paths.withColumn("rank", F.row_number().over(wr))
    return (
        ranked.filter(F.col("rank") <= _PATH_K)
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "s1",
            "s2",
            "s3",
            "n_paths",
            round6(F.col("n_paths") / F.col("n_total")).alias("share"),
        )
    )


@register("e_path_topk", _PATH_TOPK_ORACLE)
def e_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k 3-step event-type paths (see section comment): two leads
    in one user-partition window, histogram on the bounded triple key,
    deterministic rank via the shared `path_topk_report_from` tail."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    )
    paths = (
        seq.filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    return path_topk_report_from(paths)


# --------------------------------------------------------------------------
# E-COOCCURRENCE-LIFT — within-session market-basket pairs
# --------------------------------------------------------------------------
# Sessions as baskets: which event types co-occur in the SAME session
# more (lift > 1) or less (lift < 1) than independence predicts.
# Session assignment reuses the shared `session_assignments` /
# `_SESSION_ASSIGN_CTES` definition (one user-partition window pass);
# baskets collapse to distinct (user, session, type) rows — bounded by
# |types| per session — and the pair relation is a co-partitioned
# SELF EQUI-JOIN on the (user, session) key, never a cross product:
# per-session blow-up is at most |types|^2, and the support rollup is
# map-side combinable on the bounded (type_a, type_b) key.  Lift and
# support derive from three tiny broadcast-joined aggregates.
_COOCCURRENCE_ORACLE = f"""
WITH {_SESSION_ASSIGN_CTES},
baskets AS (
    SELECT DISTINCT user_id, session_idx, event_type FROM assigned
),
n_sessions AS (
    SELECT count(DISTINCT (user_id, session_idx)) AS n FROM assigned
),
singles AS (
    SELECT event_type, count(*) AS n_type FROM baskets GROUP BY 1
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_ab
    FROM baskets a
    JOIN baskets b
      ON a.user_id = b.user_id AND a.session_idx = b.session_idx
     AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_ab,
       sa.n_type AS n_a, sb.n_type AS n_b,
       round(p.n_ab / ns.n * 1000000 + 0.01, 0) / 1000000 + 0 AS support,
       round((CAST(p.n_ab AS DOUBLE) * ns.n) / (sa.n_type * sb.n_type)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS lift
FROM pairs p
JOIN singles sa ON p.type_a = sa.event_type
JOIN singles sb ON p.type_b = sb.event_type
CROSS JOIN n_sessions ns
"""


def cooccurrence_report_from(baskets: DataFrame) -> DataFrame:
    """Read-time support/lift derivation over a DISTINCT
    (user_id, session_idx, event_type) basket-membership relation —
    shared by the batch query and the streaming basket maintainer
    (`stream_eventops.basket_stream`) so the lift definition can't
    drift.  The pair relation is a co-partitioned self equi-join on
    the (user, session) key (per-session blow-up <= |types|^2, never a
    cross product); marginals and the session total broadcast."""
    from oxford_data_pipeline_spark.functions.compat import round6

    n_sessions = baskets.select("user_id", "session_idx").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    singles = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type")
    )
    pairs = (
        baskets.select(
            "user_id", "session_idx", F.col("event_type").alias("type_a")
        )
        .join(
            baskets.select(
                "user_id", "session_idx", F.col("event_type").alias("type_b")
            ),
            ["user_id", "session_idx"],
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            round6(F.col("n_ab") / F.col("n")).alias("support"),
            round6(
                (F.col("n_ab").cast("double") * F.col("n"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


@register("e_cooccurrence_lift", _COOCCURRENCE_ORACLE)
def e_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type co-occurrence with support and lift
    (see section comment): sessions as baskets (shared
    `session_assignments` definition), then the shared
    `cooccurrence_report_from` tail."""
    ev = load_table(spark, sf_dir, "events")
    assigned = session_assignments(ev)
    baskets = assigned.select(
        "user_id", "session_idx", "event_type"
    ).distinct()
    return cooccurrence_report_from(baskets)


# --------------------------------------------------------------------------
# E-INTERARRIVAL — per-type inter-arrival time distribution
# --------------------------------------------------------------------------
# Latency-profile the event stream: for each event type, the gaps
# between consecutive events of that type BY THE SAME USER.  Gap
# extraction is one lag in a (user, type)-partition window (single
# exchange); the per-type rollup is an ordinary aggregation whose only
# non-combinable members are the exact percentiles — kept exact here
# so the oracle agrees, with the documented 100 TB swap to
# `percentile_approx` (mergeable t-digest) at a fixed accuracy.  All
# time math in integer nanoseconds until the final divide.
_INTERARRIVAL_ORACLE = """
WITH ordered AS (
    SELECT event_type, epoch_ns(ts) AS ts_ns,
           lag(epoch_ns(ts)) OVER (PARTITION BY user_id, event_type
                                   ORDER BY epoch_ns(ts), event_id) AS prev_ts
    FROM events
),
gaps AS (
    SELECT event_type, ts_ns - prev_ts AS gap_ns
    FROM ordered WHERE prev_ts IS NOT NULL
)
SELECT event_type,
       count(*) AS n_gaps,
       round(avg(gap_ns / 60000000000.0) * 1000000 + 0.01, 0) / 1000000 + 0
           AS mean_minutes,
       round(quantile_cont(gap_ns / 60000000000.0, 0.5) * 1000000 + 0.01, 0)
           / 1000000 + 0 AS p50_minutes,
       round(quantile_cont(gap_ns / 60000000000.0, 0.9) * 1000000 + 0.01, 0)
           / 1000000 + 0 AS p90_minutes,
       max(gap_ns) // 60000000000 AS max_whole_minutes
FROM gaps
GROUP BY 1
"""


def interarrival_report_from(gaps: DataFrame) -> DataFrame:
    """Read-time per-type gap rollup over an (event_type, gap_ns)
    relation — shared by the batch query and the streaming last-seen
    register (`stream_eventops.interarrival_gap_stream`) so the
    percentile/rounding definition can't drift.  Exact percentiles on
    the bounded per-type grain; the documented 100 TB swap is
    `percentile_approx` over the same relation."""
    from oxford_data_pipeline_spark.functions.compat import round6

    gaps = gaps.withColumn(
        "gap_min", F.col("gap_ns") / F.lit(60_000_000_000.0)
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        round6(F.avg("gap_min")).alias("mean_minutes"),
        round6(F.percentile("gap_min", F.lit(0.5))).alias("p50_minutes"),
        round6(F.percentile("gap_min", F.lit(0.9))).alias("p90_minutes"),
        F.expr("max(gap_ns) DIV 60000000000").alias("max_whole_minutes"),
    )


@register("e_interarrival", _INTERARRIVAL_ORACLE)
def e_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival gap distribution (see section comment):
    one lag in a (user, type) window, then the shared
    `interarrival_report_from` rollup tail."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gaps = ev.select(
        "event_type",
        (F.col("ts") - F.lag("ts").over(w)).alias("gap_ns"),
    ).filter(F.col("gap_ns").isNotNull())
    return interarrival_report_from(gaps)


# --------------------------------------------------------------------------
# E-SEASONALITY — day-of-week periodicity detection (chi-square)
# --------------------------------------------------------------------------
# Does an event type beat to a weekly rhythm?  The corpus collapses
# FIRST to the (event_type, day-of-week) count grid — one map-side-
# combinable aggregation, the only corpus-sized step, same posture as
# e_rolling_anomaly's day grain — and the chi-square statistic against
# the uniform-weekday null runs on the bounded |types| x 7 relation
# (absent weekdays contribute their full (0-E)^2/E term via a
# broadcast 7-row grid, so partial weeks can't silently deflate the
# statistic).  is_periodic thresholds at the df=6, alpha=0.05 critical
# value; the peak weekday is deterministic (max count, then smallest
# dow).  Day-of-week = (epoch_day + 4) mod 7 with 0 = Sunday (day 0,
# 1970-01-01, was a Thursday) — integer arithmetic, timezone-free.
# Cross-engine contract (r13 advisor item 2): epoch_day is FLOOR
# division on both sides (Spark via `floor_div_sql`, DuckDB's `//`
# already floors) and the mod is non-negative on both sides (Spark
# `pmod`, DuckDB `((x % 7) + 7) % 7`), so pre-epoch timestamps land on
# the same dow in [0, 6] in both engines instead of falling off the
# 7-row grid.
_CHI2_CRIT_DF6 = 12.591587243743977  # chi2.ppf(0.95, 6)

_SEASONALITY_ORACLE = f"""
WITH counts AS (
    SELECT event_type,
           CAST((({ORACLE_EPOCH_DAY_SQL} + 4) % 7 + 7) % 7 AS BIGINT) AS dow,
           count(*) AS n
    FROM events GROUP BY 1, 2
),
grid AS (
    SELECT t.event_type, d.range AS dow, coalesce(c.n, 0) AS n
    FROM (SELECT DISTINCT event_type FROM counts) t
    CROSS JOIN range(7) d
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.dow = d.range
),
tot AS (
    SELECT event_type, sum(n) AS n_total FROM grid GROUP BY 1
),
ranked AS (
    SELECT g.event_type, g.dow, g.n, t.n_total,
           row_number() OVER (PARTITION BY g.event_type
                              ORDER BY g.n DESC, g.dow) AS rn
    FROM grid g JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(max(n_total) AS BIGINT) AS n_events,
       round(sum(pow(n - n_total / 7.0, 2) / (n_total / 7.0))
             * 1000000 + 0.01, 0) / 1000000 + 0 AS chi2,
       CAST(max(CASE WHEN rn = 1 THEN dow END) AS BIGINT) AS peak_dow,
       round(max(CASE WHEN rn = 1 THEN n END) / max(n_total)
             * 1000000 + 0.01, 0) / 1000000 + 0 AS peak_share,
       CAST(sum(pow(n - n_total / 7.0, 2) / (n_total / 7.0))
            > {_CHI2_CRIT_DF6} AS INT) AS is_periodic
FROM ranked
GROUP BY 1
"""


@register("e_seasonality", _SEASONALITY_ORACLE)
def e_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week periodicity per event type (see section comment):
    one corpus-sized count aggregation to the |types| x 7 grid, then
    chi-square vs the uniform null with a deterministic peak weekday."""
    from oxford_data_pipeline_spark.functions.compat import round6

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.expr(f"pmod({EPOCH_DAY_SQL} + 4, 7)").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # full 7-day grid per type: absent weekdays must contribute their
    # (0 - E)^2 / E term (broadcast 7-row dimension, bounded)
    dows = spark.range(7).select(F.col("id").alias("dow"))
    types = counts.select("event_type").distinct()
    grid = (
        types.join(F.broadcast(dows))
        .join(counts, ["event_type", "dow"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    tot = grid.groupBy("event_type").agg(F.sum("n").alias("n_total"))
    wr = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("dow")
    )
    ranked = grid.join(F.broadcast(tot), "event_type").withColumn(
        "rn", F.row_number().over(wr)
    )
    exp = F.col("n_total") / F.lit(7.0)
    chi2 = F.sum(F.pow(F.col("n") - exp, F.lit(2)) / exp)
    return ranked.groupBy("event_type").agg(
        F.max("n_total").cast("bigint").alias("n_events"),
        round6(chi2).alias("chi2"),
        F.max(F.when(F.col("rn") == 1, F.col("dow"))).cast("bigint").alias(
            "peak_dow"
        ),
        round6(
            F.max(F.when(F.col("rn") == 1, F.col("n"))) / F.max("n_total")
        ).alias("peak_share"),
        (chi2 > _CHI2_CRIT_DF6).cast("int").alias("is_periodic"),
    )
