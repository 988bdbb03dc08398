"""DSIR importance-resampling operator (operators/selection.py).

Semantics pinned on a tiny corpus where the math is checkable by hand-ish
reasoning: documents that share vocabulary with the target corpus must
weigh higher than documents that don't. The registry twins
(dsir_weights_docs / dsir_select_docs) are hash-verified against DuckDB;
these tests cover the operator API surface the registry doesn't.
"""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.selection import (
    dsir_importance_weights,
    dsir_log_ratio_table,
    dsir_resample,
)


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(100, "spark table row spark table"), (101, "spark row table join")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "spark table row join spark"),   # target-like
            (2, "zebra quagga okapi giraffe"),   # off-distribution
            (3, ""),                              # empty
            (4, "spark spark spark table table"),  # target-like
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_weights_rank_target_like_docs(corpora):
    raw, target = corpora
    w = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_importance_weights(raw, target, buckets=256).collect()
    }
    assert set(w) == {1, 2, 3, 4}
    assert w[3] == 0  # no grams -> zero weight
    assert w[1] > w[2] and w[4] > w[2]  # target-like beats off-distribution


def test_ratio_table_reuse_matches_inline_fit(corpora):
    raw, target = corpora
    table = dsir_log_ratio_table(raw, target, buckets=256)
    inline = dsir_importance_weights(raw, target, buckets=256)
    reused = dsir_importance_weights(raw, target, buckets=256, ratio_table=table)
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, reused.collect()))


def test_ratio_table_covers_every_bucket(corpora):
    raw, target = corpora
    table = dsir_log_ratio_table(raw, target, buckets=64)
    assert table.count() == 64
    assert table.select("_b").distinct().count() == 64


def test_resample_is_deterministic_and_ordered(corpora):
    raw, target = corpora
    a = dsir_resample(raw, target, k=3, buckets=256).collect()
    b = dsir_resample(raw, target, k=3, buckets=256).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    keys = [r["key_micro"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert len(a) == 3


def test_resample_temperature_flattens_selection(corpora):
    raw, target = corpora
    # at a huge temperature the weight term vanishes and the Gumbel noise
    # (uniform across docs) dominates — selection ignores the weights
    hot = dsir_resample(raw, target, k=4, buckets=256, temperature=1e12)
    got = {r["doc_id"] for r in hot.collect()}
    assert got == {1, 2, 3, 4}


def test_no_cartesian_in_weight_plan(corpora):
    raw, target = corpora
    plan = (
        dsir_importance_weights(raw, target, buckets=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the model table reaches the per-doc join as a broadcast (the only
    # nested-loop joins are the single-row T/R totals crossed into the
    # buckets-row frame — bounded, model-side only)
    assert "BroadcastHashJoin" in plan
