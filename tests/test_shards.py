"""Deterministic training-shard sink (sources/shards.py): stable
assignment, one file per shard, partition-pruned subset reads."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.sources import shards as sh


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id long, text string"
    )


def test_shard_assignment_deterministic_and_partition_stable(docs):
    a = {r["doc_id"]: r["shard"] for r in sh.with_shard(docs, "doc_id", 8).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in sh.with_shard(docs.repartition(13), "doc_id", 8).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))
    # roughly balanced: no shard holds more than 2x the fair share
    from collections import Counter

    counts = Counter(a.values())
    assert max(counts.values()) < 2 * 500 / 8


def test_write_read_roundtrip_one_file_per_shard(docs, tmp_path):
    out = str(tmp_path / "corpus")
    sh.write_training_shards(docs, out, "doc_id", 8)
    # one data file per shard directory
    for k in range(8):
        files = [
            f
            for f in glob.glob(os.path.join(out, f"shard={k}", "*"))
            if not os.path.basename(f).startswith(("_", "."))
        ]
        assert len(files) == 1, f"shard {k}: {files}"
    back = sh.read_training_shards(docs.sparkSession, out)
    assert back.count() == 500
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(500))


def test_subset_read_prunes_partitions(docs, tmp_path):
    out = str(tmp_path / "corpus2")
    sh.write_training_shards(docs, out, "doc_id", 4)
    spark = docs.sparkSession
    sub = sh.read_training_shards(spark, out, shards=[1, 3])
    got = {r["shard"] for r in sub.select("shard").distinct().collect()}
    assert got == {1, 3}
    # partition filter reaches the scan: the pruned plan reads 2 of 4 dirs
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan
    expected = sh.with_shard(docs, "doc_id", 4).filter(F.col("shard").isin(1, 3))
    assert sub.count() == expected.count()
