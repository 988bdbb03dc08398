"""Deterministic sampling / splitting / packing / contamination operators."""

import pytest
from pyspark.sql import Row, functions as F

from cypher_for_apache_spark_spark.operators.contamination import ngram_contamination
from cypher_for_apache_spark_spark.operators.sampling import (
    hash_sample,
    hash_split,
    pack_sequences,
    split_cutoffs,
    stratified_sample,
)
from cypher_for_apache_spark_spark.operators.text import token_count_regex


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 3}", text=f"doc {i} " + "word " * (i % 7 + 1))
        for i in range(60)
    ]
    return spark.createDataFrame(rows)


def test_split_cutoffs_cumulative():
    cuts = split_cutoffs({"train": 0.5, "val": 0.25, "test": 0.25})
    assert [c[0] for c in cuts] == ["train", "val", "test"]
    assert cuts[0][1] == "80000000" and cuts[1][1] == "c0000000"
    assert cuts[2][1] == "g"  # sentinel above any hex digit


def test_hash_split_partition_and_determinism(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == 60  # total preserved
    assert out.where("split IS NULL").count() == 0
    # deterministic: same assignment on a differently-partitioned input
    again = hash_split(docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b
    # roughly proportional (hash uniformity, loose bound on 60 rows)
    n_train = out.where("split = 'train'").count()
    assert 36 <= n_train <= 59


def test_hash_sample_is_subset_and_stable(docs):
    s1 = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect())
    s2 = set(r["doc_id"] for r in hash_sample(docs.repartition(5), "doc_id", 0.3).collect())
    assert s1 == s2 and 0 < len(s1) < 60
    # nested property: a 10% sample is a subset of the 30% sample
    s3 = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect())
    assert s3 <= s1


def test_stratified_sample_exactly_k_per_group(docs):
    out = stratified_sample(docs, "source", "doc_id", k=4)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    assert out.select("rk").distinct().count() == 4


def test_pack_sequences_bins_monotonic(docs):
    d = docs.withColumn("t", F.size(F.split(F.col("text"), r"\s+")))
    out = pack_sequences(d, "t", max_tokens=10, part_col="source", order_col="doc_id")
    rows = sorted(out.collect(), key=lambda r: (r["source"], r["doc_id"]))
    # bins start at 0 per shard, never decrease, and bin changes only after
    # the running total crosses a multiple of max_tokens
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        cum = 0
        for r in rs:
            assert r["bin"] == cum // 10
            cum += r["t"]


def test_ngram_contamination_plants_leak(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [Row(doc_id=100, text="completely different training words here okay " * 3),
         Row(doc_id=101, text=f"prefix words then {leak} then suffix words")]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=1, text=leak),  # fully contained 10-token doc
         Row(doc_id=2, text="totally novel benchmark content with many unseen tokens inside")]
    )
    out = {r["doc_id"]: r for r in ngram_contamination(train, bench, n=8).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_matched"] == 3
    assert out[1]["contamination"] == 1.0
    assert out[2]["n_matched"] == 0 and out[2]["contamination"] == 0.0


def test_ngram_contamination_short_doc_zero(spark):
    train = spark.createDataFrame([Row(doc_id=1, text="a b c d e f g h i j")])
    bench = spark.createDataFrame([Row(doc_id=2, text="too short")])
    r = ngram_contamination(train, bench, n=8).collect()[0]
    assert r["n_grams"] == 0 and r["contamination"] == 0.0


def test_token_count_regex(spark):
    df = spark.createDataFrame([Row(text="Hello, world 42 times!")])
    # normalized: "hello, world 42 times!" -> hello | , | world | 42 | times | !
    assert df.select(token_count_regex(F.col("text")).alias("n")).collect()[0]["n"] == 6


def test_temperature_mix_quotas_and_determinism(spark):
    import math

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "small")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    from cypher_for_apache_spark_spark.operators.sampling import temperature_mix

    out = temperature_mix(df, "src", "doc_id", alpha=0.5, total=300)
    got = out.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in got}
    # replay the quota arithmetic
    counts = {"big": 900, "mid": 90, "small": 10}
    wts = {g: int(math.floor(math.sqrt(float(n)) * 1e6)) for g, n in counts.items()}
    tw = sum(wts.values())
    expect = {g: min(counts[g], wts[g] * 300 // tw) for g in counts}
    assert by == expect
    # alpha < 1 upweights the tail: small source share grows vs raw mix
    assert by["small"] / sum(by.values()) > 10 / 1000
    # deterministic: same rows both runs
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"] for r in temperature_mix(df, "src", "doc_id", total=300).collect()
    )
    assert a == b
    # repartitioning the input must not change the selection
    c = sorted(
        r["doc_id"]
        for r in temperature_mix(
            df.repartition(7), "src", "doc_id", total=300
        ).collect()
    )
    assert a == c


def test_temperature_mix_alpha_one_matches_proportional(spark):
    rows = [(i, "a" if i % 4 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    from cypher_for_apache_spark_spark.operators.sampling import temperature_mix

    out = temperature_mix(df, "src", "doc_id", alpha=1.0, total=100)
    by = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    # alpha=1 preserves the raw mix: 300/100 -> 75/25
    assert by == {"a": 75, "b": 25}
