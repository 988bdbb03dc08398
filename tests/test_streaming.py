"""Structured Streaming extension tests: drive file-backed streams to
completion with the memory sink and compare against batch equivalents."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.streaming import events as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream(spark):
    return S.read_events_stream(spark, SF_DIR)


def test_windowed_rollup_matches_batch(spark, stream):
    # complete mode: append would hold back the final (still-open) windows
    # that the watermark never closes on a finite file stream
    S.run_to_memory(
        S.windowed_rollup(stream, window="1 hour"), "rollup_out", output_mode="complete"
    )
    got = spark.sql(
        "SELECT window_start, event_type, n FROM rollup_out"
    ).collect()
    assert len(got) > 0

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(SF_DIR + "/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {
        (r["window"]["start"], r["event_type"]): r["n"] for r in batch.collect()
    }
    got_map = {(r["window_start"], r["event_type"]): r["n"] for r in got}
    assert got_map == want


def test_streaming_sessionize(spark, stream):
    # complete mode: in append mode a finite availableNow replay never
    # advances the watermark past the final sessions, so nothing is emitted
    # before the query stops (the rollup test hits the same Structured
    # Streaming property above)
    S.run_to_memory(
        S.streaming_sessionize(stream, gap="30 minutes"),
        "sess_out",
        output_mode="complete",
    )
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)

    # cross-check against the batch operator: identical gap definition, so
    # per-user session counts and per-user event totals must agree
    from cypher_for_apache_spark_spark.operators.events import sessionize

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(SF_DIR + "/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    want = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in sessionize(batch, gap_minutes=30)
        .groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    got = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in spark.sql(
            """SELECT user_id, count(*) AS n_sessions,
                      sum(n_events) AS n_events
               FROM sess_out GROUP BY user_id"""
        ).collect()
    }
    assert got == want


def test_streaming_dedup(spark, stream):
    S.run_to_memory(S.streaming_dedup(stream), "dedup_out", output_mode="append")
    n = spark.sql("SELECT count(*) AS c FROM dedup_out").collect()[0]["c"]
    total = spark.read.parquet(SF_DIR + "/events.parquet").count()
    # source has unique event ids; dedup must not drop or duplicate anything
    assert n == total


def test_streaming_funnel_matches_batch(spark, stream):
    """Custom applyInPandasWithState funnel vs the pure-DataFrame batch
    oracle: identical completion sets on a full replay."""
    S.run_to_memory(S.streaming_funnel(stream), "funnel_out")
    got = {
        (r["user_id"], r["completed_at"])
        for r in spark.sql("SELECT * FROM funnel_out").collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_events = (
        spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(SF_DIR + "/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    want = {
        (r["user_id"], r["completed_at"])
        for r in S.batch_funnel(batch_events).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_funnel_no_reemit(spark, tmp_path):
    """A completed user's tombstone survives re-delivery: the same events
    arrive again in a LATER micro-batch (two copies of the file, processed
    one per trigger) and each user still completes exactly once."""
    import shutil

    src_dir = str(tmp_path / "replayed")
    (tmp_path / "replayed").mkdir()
    shutil.copy(SF_DIR + "/events.parquet", src_dir + "/batch_a.parquet")
    shutil.copy(SF_DIR + "/events.parquet", src_dir + "/batch_b.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    replay = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    S.run_to_memory(S.streaming_funnel(replay), "funnel_once")
    rows = spark.sql(
        "SELECT user_id, count(*) AS n FROM funnel_once GROUP BY user_id"
    ).collect()
    assert rows and all(r["n"] == 1 for r in rows)


def test_enrich_stream_static(spark, stream, tmp_path):
    """Stream-static join: every event row picks up its dimension label;
    results match the equivalent batch join."""
    dim = spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(200)], "user_id long, segment string"
    )
    S.run_to_memory(
        S.enrich_stream(stream, dim).groupBy("segment").count(),
        "enrich_out",
        output_mode="complete",
    )
    got = {
        (r["segment"], r["count"])
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(SF_DIR + "/events.parquet")
        .join(dim, "user_id", "left")
        .groupBy("segment")
        .count()
    )
    want = {(r["segment"], r["count"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_stream_join_bounded(spark, tmp_path):
    """Windowed stream-stream join: clicks join views of the same user
    within the window; a view outside the window finds no match."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write(dirname, rows):
        p = str(tmp_path / dirname)
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, kind string"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        return (
            spark.readStream.schema("user_id long, ts timestamp, kind string")
            .parquet(p)
        )

    views = write(
        "views",
        [
            (1, t0, "view"),
            (2, t0, "view"),
            (3, t0 - dt.timedelta(hours=3), "view"),  # too old to match
        ],
    )
    clicks = write(
        "clicks",
        [
            (1, t0 + dt.timedelta(minutes=10), "click"),
            (2, t0 + dt.timedelta(minutes=50), "click"),  # outside 30m window
            (3, t0, "click"),
        ],
    )
    joined = S.stream_stream_join(
        views, clicks, on="user_id", join_window="30 minutes"
    ).select(F.col("l.user_id").alias("user_id"))
    S.run_to_memory(joined, "ssj_out", output_mode="append")
    got = {r["user_id"] for r in spark.sql("SELECT * FROM ssj_out").collect()}
    assert got == {1}


def test_streaming_cm_sketch_matches_batch(spark, stream):
    # the batch count-min operator runs unchanged on a stream (explode +
    # map-side-combinable agg, complete mode): stream-built counters are
    # bit-identical to batch-built ones, so sketches from both paths merge
    from cypher_for_apache_spark_spark.operators.sketches import cm_sketch

    S.run_to_memory(
        cm_sketch(stream, "event_type", depth=4, width=64),
        "cm_stream_out",
        output_mode="complete",
    )
    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in spark.sql("SELECT r, c, cnt FROM cm_stream_out").collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(SF_DIR + "/events.parquet")
    )
    want = {
        (r["r"], r["c"]): r["cnt"]
        for r in cm_sketch(batch, "event_type", depth=4, width=64).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_against_store(spark, tmp_path):
    # two micro-batches arriving as files: batch 2 repeats a batch-1 doc
    # and brings an internal dup; the persistent store catches both
    import time as _t

    src = tmp_path / "in"
    src.mkdir()
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "completely different sentence about spark engines and catalyst"
    c = "fresh unseen content about parquet column pruning today folks"

    def _drop(df, name):
        # the file stream source lists FILES, not nested dirs: stage the
        # parquet dir then move its part file into the watched directory
        import shutil, glob as _g
        stage = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(stage))
        part = _g.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(part, str(src / (name + ".parquet")))

    _drop(spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string"),
          "batch1")

    q = S.streaming_dedup_against_store(
        spark.readStream.schema("doc_id long, text string").parquet(str(src)),
        store, out, checkpoint=ck,
    )
    q.awaitTermination(120)

    _drop(spark.createDataFrame(
        [(10, a), (11, c), (12, c)], "doc_id long, text string"), "batch2")
    q2 = S.streaming_dedup_against_store(
        spark.readStream.schema("doc_id long, text string").parquet(str(src)),
        store, out, checkpoint=ck,
    )
    q2.awaitTermination(120)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 11]  # 10 dups batch-1 doc, 12 dups 11 in-batch
    sigs = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
    assert sigs == [1, 2, 11]  # store grew by survivors only


def test_dedup_batch_retry_is_idempotent(spark, tmp_path):
    # simulate foreachBatch's at-least-once contract: re-running the SAME
    # batch_id must neither re-append (dup output) nor dedup the batch
    # against its own failed attempt (which would drop the whole batch)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "completely different sentence about spark engines and catalyst"
    batch = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")

    S.dedup_batch_against_store(batch, 0, store, out)
    S.dedup_batch_against_store(batch, 0, store, out)  # retry

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2]
    sigs = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
    assert sigs == [1, 2]

    # a LATER batch still dedups against the store
    batch2 = spark.createDataFrame([(3, a)], "doc_id long, text string")
    S.dedup_batch_against_store(batch2, 1, store, out)
    S.dedup_batch_against_store(batch2, 1, store, out)  # retry
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2]


def test_dedup_batch_store_read_failure_propagates(spark, tmp_path):
    # a corrupt store must raise, not be treated as "first batch"
    store = tmp_path / "store"
    (store / "batch_id=0").mkdir(parents=True)
    (store / "batch_id=0" / "part-0000.parquet").write_bytes(b"not a parquet file")
    batch = spark.createDataFrame(
        [(1, "some text here for the batch")], "doc_id long, text string"
    )
    with pytest.raises(Exception) as ei:
        S.dedup_batch_against_store(batch, 1, str(store), str(tmp_path / "out"))
    from pyspark.errors import AnalysisException

    assert not isinstance(ei.value, AnalysisException)


def test_streaming_hll_rollup_matches_batch(spark, tmp_path):
    # two micro-batches of events; the merged register store must equal
    # the batch-mode portable sketch over the full data, and re-running a
    # batch (at-least-once retry) must not change the state (MAX-merge
    # idempotence)
    import shutil, glob as _g

    from cypher_for_apache_spark_spark.operators.sketches import (
        hll_portable_estimate,
        hll_portable_registers,
        hll_portable_summary,
    )

    src = tmp_path / "in"; src.mkdir()
    store = str(tmp_path / "hll_store")
    ck = str(tmp_path / "ck")

    rows1 = [(f"u{i % 40}", "view") for i in range(200)]
    rows2 = [(f"u{i % 70}", "view") for i in range(200)] + [
        (f"u{i}", "click") for i in range(25)
    ]

    def _drop(rows, name):
        df = spark.createDataFrame(rows, "user_id string, event_type string")
        stage = tmp_path / ("stage_" + name)
        df.coalesce(1).write.parquet(str(stage))
        part = _g.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(part, str(src / (name + ".parquet")))

    _drop(rows1, "b1")
    q = S.streaming_hll_rollup(
        spark.readStream.schema("user_id string, event_type string").parquet(str(src)),
        store, checkpoint=ck)
    q.awaitTermination(120)
    _drop(rows2, "b2")
    q2 = S.streaming_hll_rollup(
        spark.readStream.schema("user_id string, event_type string").parquet(str(src)),
        store, checkpoint=ck)
    q2.awaitTermination(120)

    merged = {
        r["event_type"]: (r["zeros"], r["powersum"])
        for r in S.read_hll_store(spark, store).collect()
    }
    full = spark.createDataFrame(rows1 + rows2, "user_id string, event_type string")
    direct = {
        r["event_type"]: (r["zeros"], r["powersum"])
        for r in hll_portable_summary(
            hll_portable_registers(full, "user_id", ["event_type"]), ["event_type"]
        ).collect()
    }
    assert merged == direct  # stream-built state == batch-built state

    # retry idempotence: re-write batch 1's registers over its partition
    b1 = spark.createDataFrame(rows1, "user_id string, event_type string")
    S.hll_register_batch(b1, 0, store, "user_id", ["event_type"])
    again = {
        r["event_type"]: (r["zeros"], r["powersum"])
        for r in S.read_hll_store(spark, store).collect()
    }
    assert again == direct

    # estimates land near truth
    est = {r["event_type"]: r["distinct_est"]
           for r in hll_portable_estimate(S.read_hll_store(spark, store)).collect()}
    assert abs(est["view"] - 70) / 70 < 0.2
    assert abs(est["click"] - 25) / 25 < 0.2
