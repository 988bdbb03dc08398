"""HLL sketch tests: accuracy envelope and merge algebra."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.sketches import (
    distinct_rollup,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


@pytest.fixture()
def events(spark):
    # 10k rows, user_id in [0, 2000), spread over 4 days x 2 sources
    return spark.range(10000).select(
        (F.col("id") % 2000).alias("user_id"),
        (F.col("id") % 4).cast("string").alias("day"),
        (F.col("id") % 2).cast("string").alias("source"),
    )


def test_estimate_within_error_bound(spark, events):
    est = hll_estimate(hll_sketch(events, "user_id")).collect()[0]["distinct_est"]
    assert abs(est - 2000) / 2000 < 0.05


def test_merge_equals_direct_sketch(spark, events):
    """Merging fine sketches must give the SAME estimate as sketching at
    the coarse grain directly — sketch algebra, not approximation luck."""
    merged = distinct_rollup(
        events, "user_id", fine_cols=["day", "source"], coarse_cols=["source"]
    )
    direct = hll_estimate(hll_sketch(events, "user_id", ["source"]))
    got = {r["source"]: r["distinct_est"] for r in merged.collect()}
    want = {r["source"]: r["distinct_est"] for r in direct.collect()}
    assert got == want


def test_rollup_to_global(spark, events):
    glob = distinct_rollup(
        events, "user_id", fine_cols=["day", "source"], coarse_cols=[]
    ).collect()[0]["distinct_est"]
    exact = events.select("user_id").distinct().count()
    assert abs(glob - exact) / exact < 0.05


def test_sketch_column_is_compact(spark, events):
    row = hll_sketch(events, "user_id", ["day"]).collect()[0]
    assert len(row["hll"]) < 64 * 1024  # a few KB, not the value set
