"""salted_join must match the plain join exactly, on skewed data."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.skew import hot_keys, salted_join


@pytest.fixture()
def skewed(spark):
    # key 0 holds 90% of rows
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )


@pytest.fixture()
def dim(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("label")
    )


def _bag(df):
    return sorted(tuple(r) for r in df.collect())


def test_hot_keys_finds_heavy_hitter(skewed):
    hot = hot_keys(skewed, ["k"], min_count=1000).collect()
    assert hot and hot[0]["k"] == 0 and hot[0]["n"] == 9000


def test_salted_inner_join_matches_plain(skewed, dim):
    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, ["k"], factor=8)
    assert _bag(salted) == _bag(plain)


def test_salted_left_join_matches_plain(spark, skewed, dim):
    # keys missing from dim: payloads with k >= 100 never occur here, so
    # add unmatched keys to the probe side instead
    probe = skewed.union(
        spark.range(3).select((F.col("id") + 1000).alias("k"), F.col("id").alias("payload"))
    )
    plain = probe.join(dim, "k", "left")
    salted = salted_join(probe, dim, ["k"], factor=8, how="left")
    assert _bag(salted) == _bag(plain)


def test_salt_actually_spreads(skewed, dim):
    # internal check: with factor=8 the hot key's rows carry >1 salt value
    from cypher_for_apache_spark_spark.operators.skew import _SALT

    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64("k", "payload"), F.lit(8)).cast("int")
    )
    n_salts = (
        salted.filter(F.col("k") == 0).select(_SALT).distinct().count()
    )
    assert n_salts == 8


def test_unsupported_how_rejected(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, ["k"], how="full")
