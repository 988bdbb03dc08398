"""chunk_tokens / rebalance_mix / weighted_sample: semantics + determinism."""

import math

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.sampling import (
    rebalance_mix,
    weighted_sample,
)
from cypher_for_apache_spark_spark.operators.text import chunk_tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g", "s0"),      # 7 tokens -> 3+3+1 at size 3
        (1, "one two three", "s0"),      # exactly one full chunk
        (2, "x", "s1"),                  # single token
        (3, "  p   q  ", "s1"),          # whitespace noise normalizes away
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_chunk_sizes_and_text(docs):
    out = chunk_tokens(docs, chunk_size=3).orderBy("doc_id", "chunk_id").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"], r["n_tokens"]))
    assert by_doc[0] == [(0, "a b c", 3), (1, "d e f", 3), (2, "g", 1)]
    assert by_doc[1] == [(0, "one two three", 3)]
    assert by_doc[2] == [(0, "x", 1)]
    assert by_doc[3] == [(0, "p q", 2)]


def test_chunk_reassembles(docs):
    out = chunk_tokens(docs, chunk_size=2)
    glued = (
        out.orderBy("doc_id", "chunk_id")
        .groupBy("doc_id")
        .agg(F.array_join(F.collect_list("chunk_text"), " ").alias("t"))
    )
    orig = {r["doc_id"]: " ".join(r["text"].split()).lower() for r in docs.collect()}
    for r in glued.collect():
        assert r["t"] == orig[r["doc_id"]]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"doc {i}", f"s{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_rebalance_mix_proportions(corpus):
    # 100 rows per group; target 50/30/20 over three of four groups
    out = rebalance_mix(corpus, "source", "doc_id", {"s0": 0.5, "s1": 0.3, "s2": 0.2})
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "s3" not in got  # unweighted group dropped
    # binding group (s0 needs 0.5*T<=100 -> T=200) kept whole
    assert got["s0"] == 100
    # thinned groups land near their targets (hash sampling is ~binomial)
    assert abs(got["s1"] - 60) <= 15
    assert abs(got["s2"] - 40) <= 13
    # and the realized mix is ordered correctly
    assert got["s0"] > got["s1"] > got["s2"]


def test_rebalance_mix_deterministic(corpus):
    w = {"s0": 0.5, "s1": 0.3, "s2": 0.2}
    a = {r["doc_id"] for r in rebalance_mix(corpus, "source", "doc_id", w).collect()}
    b = {
        r["doc_id"]
        for r in rebalance_mix(corpus.repartition(13), "source", "doc_id", w).collect()
    }
    assert a == b


def test_rebalance_subset_of_input(corpus):
    out = rebalance_mix(corpus, "source", "doc_id", {"s0": 1.0, "s1": 1.0})
    rows = out.collect()
    assert {r["source"] for r in rows} == {"s0", "s1"}
    assert len(rows) == 200  # equal weights, equal sizes: nothing thinned


@pytest.fixture(scope="module")
def weighted(spark):
    # weights 1..200; heavier rows should win far more often
    rows = [(i, float(i + 1)) for i in range(200)]
    return spark.createDataFrame(rows, "id long, w double")


def test_weighted_sample_exact_k_and_bias(weighted):
    out = weighted_sample(weighted, "id", "w", k=50)
    ids = [r["id"] for r in out.collect()]
    assert len(ids) == len(set(ids)) == 50
    # mean weight of winners must exceed the population mean decisively
    assert sum(i + 1 for i in ids) / 50 > 125  # population mean ~100.5


def test_weighted_sample_deterministic_and_grouped(weighted):
    a = {r["id"] for r in weighted_sample(weighted, "id", "w", k=50).collect()}
    b = {
        r["id"]
        for r in weighted_sample(weighted.repartition(7), "id", "w", k=50).collect()
    }
    assert a == b
    grouped = weighted.withColumn("g", (F.col("id") % 4).cast("string"))
    per = weighted_sample(grouped, "id", "w", k=10, group_col="g")
    counts = {r["g"]: r["n"] for r in per.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}


def test_weighted_sample_matches_reference_priority(weighted):
    """The chosen set is exactly the top-k by ln(u)/w recomputed in
    plain Python over the same md5-derived u."""
    import hashlib

    rows = weighted.collect()
    pri = {}
    for r in rows:
        h = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / (1 << 32)
        pri[r["id"]] = math.log(u) / r["w"]
    expect = set(sorted(pri, key=lambda i: (-pri[i], i))[:50])
    got = {r["id"] for r in weighted_sample(weighted, "id", "w", k=50).collect()}
    assert got == expect
