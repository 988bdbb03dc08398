"""As-of join: semantics vs pandas.merge_asof, tie/tolerance/direction
behavior, and the one-shuffle plan shape."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),
            (1, _ts("2024-01-01 10:05:00"), "l2"),
            (1, _ts("2024-01-01 09:00:00"), "l0"),  # before any right row
            (2, _ts("2024-01-01 10:00:00"), "l3"),  # tie with right ts
            (3, _ts("2024-01-01 10:00:00"), "l4"),  # key with no right rows
        ],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:58:00"), 10.0),
            (1, _ts("2024-01-01 10:03:00"), 20.0),
            (2, _ts("2024-01-01 10:00:00"), 30.0),
            (2, _ts("2024-01-01 11:00:00"), 40.0),
        ],
        "k long, ts timestamp, rv double",
    )
    return left, right


def test_backward_matches_merge_asof(frames):
    left, right = frames
    got = (
        asof_join(left, right, on=["k"])
        .orderBy("k", "ts")
        .toPandas()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="k", suffixes=("", "_right"))
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert list(got["lv"]) == list(exp["lv"])
    assert [None if pd.isna(v) else v for v in got["rv_right"]] == [
        None if pd.isna(v) else v for v in exp["rv"]
    ]


def test_tie_is_inclusive(frames):
    left, right = frames
    got = {
        r["lv"]: r["rv_right"]
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert got["l3"] == 30.0  # equal timestamps match
    assert got["l0"] is None  # nothing at-or-before
    assert got["l4"] is None  # key absent from right
    assert got["l1"] == 10.0
    assert got["l2"] == 20.0


def test_forward_direction(frames):
    left, right = frames
    got = {
        r["lv"]: r["rv_right"]
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert got["l0"] == 10.0  # earliest at-or-after
    assert got["l1"] == 20.0
    assert got["l2"] is None  # nothing after 10:05
    assert got["l3"] == 30.0  # inclusive tie forward too


def test_tolerance_and_inner(frames):
    left, right = frames
    got = {
        r["lv"]: r["rv_right"]
        for r in asof_join(
            left, right, on=["k"], tolerance_seconds=120
        ).collect()
    }
    assert got["l1"] == 10.0  # 2 min gap, at the limit
    assert got["l2"] == 20.0
    assert got["l3"] == 30.0
    inner = asof_join(
        left, right, on=["k"], tolerance_seconds=120, how="inner"
    )
    assert {r["lv"] for r in inner.collect()} == {"l1", "l2", "l3"}


def test_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window; the union itself must not shuffle, and
    # there must be no nested-loop / cartesian range join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_bucketed(spark):
    from cypher_for_apache_spark_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 100.0), (3, 250.0), (4, 300.0), (5, 299.999)],
        "lid long, p double",
    )
    right = spark.createDataFrame(
        # [0,300): spans many buckets; [100,101): sub-bucket; [300,400)
        [(10, 0.0, 300.0), (11, 100.0, 101.0), (12, 300.0, 400.0)],
        "rid long, s double, e double",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "p", "s", "e", bucket=50.0).collect()
    }
    assert got == {
        (1, 10), (2, 10), (3, 10), (5, 10),  # inside [0,300)
        (2, 11),                              # exactly at start: included
        (4, 12),                              # 300 excluded from [0,300), in [300,400)
    }


def test_range_join_with_keys(spark):
    from cypher_for_apache_spark_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [("x", 5.0), ("y", 5.0)], "k string, p double"
    )
    right = spark.createDataFrame(
        [("x", 0.0, 10.0)], "k string, s double, e double"
    )
    rows = range_join(left, right, "p", "s", "e", bucket=4.0, keys=["k"]).collect()
    assert len(rows) == 1 and rows[0]["k"] == "x"
