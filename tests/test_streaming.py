"""Structured Streaming operators: file source -> memory sink, compared
against the same operator run in batch mode (unified-model check)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from age_spark.streaming import (
    read_event_stream,
    running_user_counts,
    session_aggregate,
    streaming_exact_dedup,
    tumbling_counts,
    with_event_time,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def event_dir(spark_mod, tmp_path_factory):
    """Events parquet re-written into a multi-file directory (file source)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    spark_mod.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark_mod.read.parquet(f"{SF_DIR}/events.parquet")
    if isinstance(df.schema["ts"].dataType, (TimestampType, TimestampNTZType)):
        df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    df.repartition(4).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def spark_mod(request):
    return request.getfixturevalue("spark")


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if sdf.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_stream_matches_batch(spark, event_dir):
    batch_src = with_event_time(spark.read.parquet(event_dir))
    expected = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in tumbling_counts(batch_src).collect()
    }

    schema = spark.read.parquet(event_dir).schema
    stream = read_event_stream(spark, event_dir, schema=schema)
    agg = tumbling_counts(stream)
    got_df = _run_stream(spark, agg, "t_tumbling")
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value) for r in got_df.collect()
    }
    assert got == expected and len(got) > 0


def test_sliding_counts_stream_matches_batch(spark, event_dir):
    from age_spark.streaming import sliding_counts

    batch_src = with_event_time(spark.read.parquet(event_dir))
    expected = {
        r.window_start: r.n for r in sliding_counts(batch_src).collect()
    }

    schema = spark.read.parquet(event_dir).schema
    stream = read_event_stream(spark, event_dir, schema=schema)
    got_df = _run_stream(spark, sliding_counts(stream), "t_sliding")
    got = {r.window_start: r.n for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_sliding_aggregate_matches_native_window(spark, event_dir):
    """pipeline.events.sliding_aggregate (integer-domain map-side pane
    replication) and Spark's native F.window sliding groupBy
    (streaming/stream.py sliding_counts) are INDEPENDENT implementations
    of the same pane semantics — they must agree bucket-for-bucket.
    Compared in epoch micros via unix_micros so no tz conversion is
    involved."""
    from age_spark.pipeline.events import sliding_aggregate
    from age_spark.streaming import sliding_counts

    batch_src = with_event_time(spark.read.parquet(event_dir))
    native = {
        r.ws: r.n
        for r in sliding_counts(batch_src, window="1 hour", slide="15 minutes")
        .select(F.unix_micros("window_start").alias("ws"), "n")
        .collect()
    }
    ints = batch_src.withColumn("ts_us", F.unix_micros(F.col("event_time")))
    ours = {
        r.win_start: r.n
        for r in sliding_aggregate(
            ints, "ts_us", 3_600_000_000, 900_000_000,
            [F.count(F.lit(1)).alias("n")],
        ).collect()
    }
    assert ours == native and len(ours) > 0


def test_session_aggregate_stream_runs(spark, event_dir):
    schema = spark.read.parquet(event_dir).schema
    stream = read_event_stream(spark, event_dir, schema=schema)
    sess = session_aggregate(stream, gap="30 minutes")
    got = _run_stream(spark, sess, "t_sessions")
    n = got.count()
    # batch twin over the same data
    batch = session_aggregate(with_event_time(spark.read.parquet(event_dir)))
    assert n == batch.count() > 0


def test_streaming_dedup(spark, event_dir):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_unique = docs.select(
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    ).distinct().count()
    out = streaming_exact_dedup(docs)
    assert out.count() == n_unique


def test_running_user_counts_stateful(spark, event_dir):
    schema = spark.read.parquet(event_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_dir)
    counts = running_user_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM t_state GROUP BY user_id"
    )
    batch = (
        spark.read.parquet(event_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    g = {r.user_id: r.n for r in got.collect()}
    b = {r.user_id: r.n for r in batch.collect()}
    assert g == b and len(g) > 0
