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


def test_histogram_sketch_rollup_and_quantile(spark):
    from cypher_for_apache_spark_spark.operators.sketches import (
        histogram_merge,
        histogram_quantile,
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [("a", 1, 0.5), ("a", 1, 1.5), ("a", 2, 9.5), ("b", 1, -3.0),
         ("b", 2, 99.0), ("b", 2, None)],
        "g string, sub int, v double",
    )
    fine = histogram_sketch(df, "v", ["g", "sub"], bins=10, lo=0.0, hi=10.0)
    rows = {(r["g"], r["sub"]): r["hist"] for r in fine.collect()}
    assert rows[("a", 1)][0] == 1 and rows[("a", 1)][1] == 1
    assert rows[("a", 2)][9] == 1
    # clamping: -3 -> bin 0, 99 -> bin 9; nulls dropped
    assert rows[("b", 1)][0] == 1
    assert rows[("b", 2)][9] == 1 and sum(rows[("b", 2)]) == 1

    merged = {r["g"]: r["hist"] for r in histogram_merge(fine, ["g"]).collect()}
    assert merged["a"] == [1, 1, 0, 0, 0, 0, 0, 0, 0, 1]

    q = histogram_quantile(
        histogram_merge(fine, ["g"]), 0.5, lo=0.0, hi=10.0
    )
    got = {r["g"]: r["q_est"] for r in q.collect()}
    # group a: counts [1,1,...,1] total 3, ceil(1.5)=2 -> bin 1 -> 1.0
    assert got["a"] == 1.0


def test_histogram_rollup_equals_direct(spark):
    from cypher_for_apache_spark_spark.operators.sketches import (
        histogram_merge,
        histogram_sketch,
    )

    df = spark.range(200).selectExpr(
        "cast(id % 4 as string) AS g", "cast(id % 7 as string) AS sub",
        "cast(id % 50 as double) AS v"
    )
    fine = histogram_sketch(df, "v", ["g", "sub"], bins=25, lo=0.0, hi=50.0)
    rolled = {r["g"]: r["hist"] for r in histogram_merge(fine, ["g"]).collect()}
    direct = {
        r["g"]: r["hist"]
        for r in histogram_sketch(df, "v", ["g"], bins=25, lo=0.0, hi=50.0).collect()
    }
    assert rolled == direct  # merging fine sketches == sketching coarse


def test_cm_sketch_estimate_never_undercounts(spark):
    from cypher_for_apache_spark_spark.operators.sketches import (
        cm_merge,
        cm_query,
        cm_sketch,
    )
    import pyspark.sql.functions as F

    data = [("a", w) for w in ["x"] * 5 + ["y"] * 3] + [
        ("b", w) for w in ["x"] * 2 + ["z"] * 7
    ]
    df = spark.createDataFrame(data, "grp string, k string")
    fine = cm_sketch(df, "k", ["grp"], depth=4, width=64)
    merged = cm_merge(fine)
    keys = spark.createDataFrame([("x",), ("y",), ("z",), ("missing",)], "key string")
    est = {r["key"]: r["freq_est"] for r in cm_query(merged, keys, depth=4, width=64).collect()}
    true = {"x": 7, "y": 3, "z": 7, "missing": 0}
    for k, t in true.items():
        assert est[k] >= t  # count-min never undercounts
    # with 4x64 counters and 3 keys there are no collisions: exact
    assert est == true


def test_cm_merge_equals_direct_sketch(spark):
    from cypher_for_apache_spark_spark.operators.sketches import cm_merge, cm_sketch

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "x")], "grp string, k string"
    )
    merged = cm_merge(cm_sketch(df, "k", ["grp"], depth=2, width=16))
    direct = cm_sketch(df, "k", (), depth=2, width=16)
    m = {(r["r"], r["c"]): r["cnt"] for r in merged.collect()}
    d = {(r["r"], r["c"]): r["cnt"] for r in direct.collect()}
    assert m == d  # rollup of fine sketches == sketch of the union
