"""Structured Streaming operators (beyond AGE parity — SURVEY §2.6 notes the
reference has no streaming surface at all; these are the additive operators a
large-scale training-data pipeline needs on live event/document feeds).

All operators take/return streaming DataFrames and are watermark-correct:
late rows beyond the watermark are dropped by Spark, state is bounded, and
every aggregate is expressible with partial aggregation (map-side combine)
so the shuffle carries compacted state, not raw events.

The same functions accept a *batch* DataFrame too (Structured Streaming's
unified model) — the oracle tests run them in batch mode, the streaming tests
through a file source + memory sink.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000


def read_event_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """File-source stream over a directory of event parquet files. The
    driver's events table carries epoch-ns LongType timestamps; a proper
    TIMESTAMP `event_time` column is derived for watermarking."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return with_event_time(df)


def with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    from pyspark.sql.types import TimestampNTZType, TimestampType

    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampType):
        return df.withColumn("event_time", F.col(ts_col))
    if isinstance(dt, TimestampNTZType):
        # NTZ carries no zone; cast under the session tz (pinned to UTC by
        # the engine's session builders so the wall-clock is preserved).
        return df.withColumn("event_time", F.col(ts_col).cast("timestamp"))
    return df.withColumn(
        "event_time", F.timestamp_seconds(F.col(ts_col) / F.lit(NS_PER_SEC))
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window per-type aggregate with late-data handling."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return (
        src.groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide panes)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return (
        src.groupBy(F.window("event_time", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based): one row per closed session with
    its event count — the streaming twin of the batch sessionization in
    __spark_entry__ (e_sessionize). Uses Spark's native session_window so
    state merges are handled by the engine, not a Python UDF."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return (
        src.groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    watermark: Optional[str] = None, event_time_col: Optional[str] = None,
) -> DataFrame:
    """Streaming exact dedup: drop rows whose normalized-text digest was
    already seen. With a watermark the digest state is bounded (the scale
    path for infinite feeds); without one, state grows with distinct docs."""
    from ..pipeline.dedup import normalized

    out = docs.withColumn("_digest", F.md5(normalized(F.col(text_col))))
    if watermark and event_time_col:
        out = out.withWatermark(event_time_col, watermark)
        return out.dropDuplicatesWithinWatermark(["_digest"]).drop("_digest")
    return out.dropDuplicates(["_digest"]).drop("_digest")


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator demo: per-user running event count + last
    event type via applyInPandasWithState (the Spark surface for operators
    that windows/aggregates can't express). State is one row per user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("last_type", StringType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("last_type", StringType())]
    )

    def update(key, pdfs, state: GroupState):
        n = 0
        last_type = None
        if state.exists:
            n, last_type = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ordered = pdf.sort_values("ts")
            n += len(ordered)
            last_type = ordered["event_type"].iloc[-1]
        state.update((n, last_type))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "last_type": [last_type]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
