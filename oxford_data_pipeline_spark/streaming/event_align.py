"""Structured Streaming variant of the event-alignment pipeline.

The reference is strictly batch (SURVEY §2.10), but its core J1
operator — align a continuous series to behavioral triggers — is a
stream-table join in batch clothing. This module gives the engine a
real streaming path: an event stream joined to static triggers, with
event-time watermarking and windowed aggregation for late data.

At scale this runs against Kafka/files with checkpointing; tests drive
it with a file source + Trigger.AvailableNow, which exercises the same
incremental execution engine deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS = 1_000_000_000


def streaming_events(spark, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ts → event-time)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import os

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # file stream sources take a directory; narrow to the events file
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # the driver has shipped ts as both raw nanosecond longs and
    # TIMESTAMP(MICROS); either way the stream's event-time clock is a
    # proper timestamp column
    ts_type = schema["ts"].dataType.typeName()
    if ts_type in ("timestamp", "timestamp_ntz"):
        return raw.withColumn("event_ts", F.col("ts").cast("timestamp"))
    return raw.withColumn("event_ts", (F.col("ts") / NS).cast("timestamp"))


def windowed_event_rates(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """A1 in streaming form: per (event_type, 1-hour event-time window)
    mean/count with late-data tolerance via watermark."""
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour").alias("w"), "event_type")
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "avg_value",
            "n",
        )
    )


def stream_trigger_join(stream: DataFrame, triggers: DataFrame) -> DataFrame:
    """J1 as a stream-static join: each streamed sample joins the
    (broadcast) trigger table on user and window containment, producing
    event-aligned rows with relative offset t (seconds).

    Static side is small per session (the reference's t_approach);
    stream-static joins need no watermark bookkeeping."""
    t = F.broadcast(triggers)
    joined = stream.join(
        t,
        (stream["user_id"] == triggers["t_user_id"])
        & stream["event_ts"].between(
            triggers["trigger_ts"] - F.expr("INTERVAL 75 MINUTES"),
            triggers["trigger_ts"] + F.expr("INTERVAL 150 MINUTES"),
        ),
        "inner",
    )
    return joined.withColumn(
        "t_offset_sec",
        (F.col("event_ts").cast("double") - F.col("trigger_ts").cast("double")),
    )


def run_available_now(df: DataFrame, query_name: str) -> list:
    """Execute a streaming plan over all currently-available input and
    return the final rows from the in-memory sink (test/dev harness)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_aggregation(df) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan
