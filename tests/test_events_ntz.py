"""Regression tests for TIMESTAMP_NTZ event columns (round-2 defect).

Parquet TIMESTAMP(NANOS) surfaces as ``timestamp_ntz`` on Spark 4+ (the
legacy ``nanosAsLong`` conf is ignored), and ``unix_micros`` rejects NTZ.
Every event operator must accept bigint-nanos, TIMESTAMP, and
TIMESTAMP_NTZ inputs and produce identical results (session tz is UTC).
"""

import datetime as dt

from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.events import sessionize, time_rollup
from cypher_for_apache_spark_spark.streaming.events import batch_funnel

ROWS = [
    # user 1: two sessions (gap > 30 min), completes view->click->purchase
    (1, "view", dt.datetime(2024, 1, 1, 10, 0, 0)),
    (1, "click", dt.datetime(2024, 1, 1, 10, 10, 0)),
    (1, "purchase", dt.datetime(2024, 1, 1, 12, 0, 0)),
    # user 2: one session, never completes the funnel
    (2, "view", dt.datetime(2024, 1, 1, 9, 0, 0)),
    (2, "purchase", dt.datetime(2024, 1, 1, 9, 5, 0)),
]


def _events(spark, ts_type):
    df = spark.createDataFrame(
        [(u, e, t, 1.0) for u, e, t in ROWS],
        "user_id long, event_type string, ts timestamp, value double",
    )
    return df.withColumn("ts", F.col("ts").cast(ts_type))


def test_sessionize_ntz_matches_timestamp(spark):
    want = {
        (r["user_id"], r["session_seq"])
        for r in sessionize(_events(spark, "timestamp")).collect()
    }
    got_df = sessionize(_events(spark, "timestamp_ntz"))
    got = {(r["user_id"], r["session_seq"]) for r in got_df.collect()}
    assert got == want
    assert {(1, 1), (1, 2), (2, 1)} <= want


def test_batch_funnel_ntz(spark):
    out = batch_funnel(_events(spark, "timestamp_ntz"))
    # the entry query's projection must also resolve on NTZ output
    proj = out.select(
        "user_id",
        F.unix_micros(F.col("completed_at").cast("timestamp")).alias("completed_us"),
    ).collect()
    assert {r["user_id"] for r in proj} == {1}
    assert proj[0]["completed_us"] == int(
        dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def test_time_rollup_ntz(spark):
    out = time_rollup(_events(spark, "timestamp_ntz"), bucket="day").collect()
    assert sum(r["n"] for r in out) == len(ROWS)


def test_read_events_normalizes_to_timestamp(spark):
    import __spark_entry__ as E

    ev = E._read_events(spark, "/root/testdata/sf0.001")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.limit(1).count() == 1
