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


def test_salted_expand_matches_plain_on_hub_graph(spark):
    """90%-skew graph (one hub node owns 90% of the edges): the salted
    expand must return exactly the plain expand's rows, and its physical
    plan must join on the widened (id, salt) key."""
    from cypher_for_apache_spark_spark.session import CypherSession

    import random

    rng = random.Random(4)
    n = 40
    people = spark.createDataFrame(
        [(i, f"p{i}") for i in range(n)], "id long, name string"
    )
    edges = []
    rid = 0
    for _ in range(180):  # 90% from hub node 0
        edges.append((rid, 0, rng.randrange(1, n))); rid += 1
    for _ in range(20):
        edges.append((rid, rng.randrange(1, n), rng.randrange(1, n))); rid += 1
    rels = spark.createDataFrame(edges, "id long, src long, dst long")

    q = ("MATCH (a:Person)-[r:FOLLOWS]->(b:Person) "
         "RETURN a.name AS a, id(r) AS r, b.name AS b")

    plain_sess = CypherSession(spark)
    g1 = plain_sess.read_from({"Person": people}, {"FOLLOWS": rels})
    plain = sorted(map(tuple, (d.values() for d in g1.cypher(q).to_maps())))

    salted_sess = CypherSession(spark, expand_salt_factor=8)
    g2 = salted_sess.read_from({"Person": people}, {"FOLLOWS": rels})
    res = g2.cypher(q)
    salted = sorted(map(tuple, (d.values() for d in res.to_maps())))

    assert salted == plain
    assert len(plain) == 200
    # plan assertion: the expand's equi-join carries the salt column
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert "salt#" in plan


def _hub_graph(spark, n=40, hub_edges=180, other_edges=20):
    import random

    rng = random.Random(4)
    people = spark.createDataFrame(
        [(i, f"p{i}") for i in range(n)], "id long, name string"
    )
    edges, rid = [], 0
    for _ in range(hub_edges):
        edges.append((rid, 0, rng.randrange(1, n))); rid += 1
    for _ in range(other_edges):
        edges.append((rid, rng.randrange(1, n), rng.randrange(1, n))); rid += 1
    rels = spark.createDataFrame(edges, "id long, src long, dst long")
    return people, rels


def test_auto_salt_triggers_on_skewed_graph(spark):
    """Default session (expand_salt_factor=0 = auto): a supernode graph
    gets the salted plan WITHOUT the caller passing a factor. The size
    gate is lowered to 0 so the sniff runs on this small fixture; the
    sniff's hot-share/min-hub thresholds are exercised for real."""
    from cypher_for_apache_spark_spark.session import CypherSession

    people, rels = _hub_graph(spark)
    sess = CypherSession(spark, expand_salt_auto_min_bytes=0)
    g = sess.read_from({"Person": people}, {"FOLLOWS": rels})
    q = ("MATCH (a:Person)-[r:FOLLOWS]->(b:Person) "
         "RETURN a.name AS a, id(r) AS r, b.name AS b")
    res = g.cypher(q)
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert "salt#" in plan  # auto-salted
    # results still exactly match a plain (salting-disabled) session
    plain_sess = CypherSession(spark, expand_salt_factor=1)
    g2 = plain_sess.read_from({"Person": people}, {"FOLLOWS": rels})
    plain = sorted(map(tuple, (d.values() for d in g2.cypher(q).to_maps())))
    got = sorted(map(tuple, (d.values() for d in res.to_maps())))
    assert got == plain and len(got) == 200
    # decision memoized per (graph, types, direction): second compile
    # reuses the verdict
    assert g._expand_salt_memo[(frozenset({"FOLLOWS"}), "out")] > 1


def test_auto_salt_skips_uniform_graph(spark):
    """Uniform degree distribution: the sniff runs (gate lowered) but must
    NOT salt — no hub holds the hot share."""
    from cypher_for_apache_spark_spark.session import CypherSession

    people = spark.createDataFrame(
        [(i, f"p{i}") for i in range(100)], "id long, name string"
    )
    rels = spark.createDataFrame(
        [(i, i % 100, (i + 1) % 100) for i in range(400)],
        "id long, src long, dst long",
    )
    sess = CypherSession(spark, expand_salt_auto_min_bytes=0)
    g = sess.read_from({"Person": people}, {"FOLLOWS": rels})
    res = g.cypher("MATCH (a:Person)-[r:FOLLOWS]->(b) RETURN id(r) AS r")
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert "salt#" not in plan
    assert res.df.count() == 400


def test_auto_salt_stats_gate_spares_small_graphs(spark):
    """Default threshold (64 MB): tiny graphs never pay the sniff job —
    the memo stays empty because the stats gate short-circuits to 0."""
    from cypher_for_apache_spark_spark.session import CypherSession

    people, rels = _hub_graph(spark)
    sess = CypherSession(spark)  # default auto + default 64 MB gate
    g = sess.read_from({"Person": people}, {"FOLLOWS": rels})
    res = g.cypher("MATCH (a:Person)-[r:FOLLOWS]->(b) RETURN id(r) AS r")
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    assert "salt#" not in plan  # hub exists, but the frame is far below the gate
    assert res.df.count() == 200
