"""Tests for exact substring-span dedup and the portable Bloom filter."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
    window_hash_rows,
)
from cypher_for_apache_spark_spark.operators.sketches import (
    bloom_build,
    bloom_contains,
    bloom_merge,
)


@pytest.fixture()
def span_docs(spark):
    rows = [
        (1, "a b c d e f g h i j k l m n o p"),
        (2, "a b c d e f g h i j x y z w q r"),
        (3, "totally unique words here only once ok"),
        (4, None),
        (5, "short text"),
        # within-document repetition: the same 5-window occurs twice in one doc
        (6, "p q r s t GAP1 GAP2 GAP3 GAP4 GAP5 GAP6 p q r s t"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_cross_doc(spark, span_docs):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(span_docs, window=5, min_count=2).collect()
    }
    # docs 1 and 2 share tokens 1..10 -> windows at pos 1..6 merge to [1, 10]
    assert (1, 1, 10, 10) in got
    assert (2, 1, 10, 10) in got
    assert not any(t[0] in (3, 4, 5) for t in got)


def test_duplicate_spans_within_doc(spark, span_docs):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(span_docs, window=5, min_count=2).collect()
        if r["doc_id"] == 6
    }
    # 'p q r s t' at pos 1 and pos 12 (normalized lowercase does not merge
    # GAPn into the repeat); two disjoint spans, not one merged one
    assert got == {(6, 1, 5), (6, 12, 16)}


def test_remove_duplicate_spans(spark, span_docs):
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(span_docs, window=5).collect()
    }
    assert got[1] == "k l m n o p"
    assert got[2] == "x y z w q r"
    assert got[3] == "totally unique words here only once ok"
    assert got[4] == ""
    assert got[5] == "short text"
    assert got[6] == "gap1 gap2 gap3 gap4 gap5 gap6"


def test_window_hash_rows_positions(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    rows = window_hash_rows(df, window=3).collect()
    assert sorted(r["pos"] for r in rows) == [1, 2]


def test_duplicate_spans_portable_modes_agree_on_span_sets(spark, span_docs):
    fast = duplicate_spans(span_docs, window=5, hash_mode="xxhash64")
    port = duplicate_spans(span_docs, window=5, hash_mode="md5")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, port.collect()))


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    vals = spark.createDataFrame(
        [(i, f"value-{i}") for i in range(500)], "id long, v string"
    )
    reg = bloom_build(vals, "v", m_words=256, k=4)
    hits = bloom_contains(reg, vals, "v", id_cols=("id",), m_words=256, k=4)
    assert hits.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_rejects_most_non_members(spark):
    vals = spark.createDataFrame(
        [(i, f"value-{i}") for i in range(200)], "id long, v string"
    )
    reg = bloom_build(vals, "v", m_words=1024, k=4)
    probes = spark.createDataFrame(
        [(i, f"absent-{i}") for i in range(200)], "id long, v string"
    )
    hits = bloom_contains(reg, probes, "v", id_cols=("id",), m_words=1024, k=4)
    fp = hits.filter(F.col("bloom_hit")).count()
    # 200 values in 32768 bits with k=4 -> FP rate well under 1%
    assert fp <= 5


def test_bloom_merge_equals_build_on_union(spark):
    a = spark.createDataFrame([(i, f"x{i}") for i in range(100)], "id long, v string")
    b = spark.createDataFrame(
        [(i, f"y{i}") for i in range(100, 200)], "id long, v string"
    )
    merged = bloom_merge(
        bloom_build(a, "v", m_words=128, k=4).unionByName(
            bloom_build(b, "v", m_words=128, k=4)
        )
    )
    direct = bloom_build(a.unionByName(b), "v", m_words=128, k=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_grouped_registers(spark):
    df = spark.createDataFrame(
        [(g, f"{g}-{i}") for g in ("a", "b") for i in range(50)],
        "grp string, v string",
    )
    reg = bloom_build(df, "v", group_cols=("grp",), m_words=128, k=4)
    assert reg.select("grp").distinct().count() == 2
    # rollup to global == build over everything
    rolled = bloom_merge(reg.drop("grp"))
    direct = bloom_build(df, "v", m_words=128, k=4)
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_null_values_skipped(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, v string")
    reg = bloom_build(df, "v", m_words=64, k=4)
    only_x = bloom_build(df.filter("v IS NOT NULL"), "v", m_words=64, k=4)
    assert sorted(map(tuple, reg.collect())) == sorted(map(tuple, only_x.collect()))
