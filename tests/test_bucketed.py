"""Bucketed graph source: correctness round-trip + shuffle elimination."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.sources.bucketed import BucketedGraphSource


@pytest.fixture(scope="module")
def bucketed(session, team_graph, spark):
    src = BucketedGraphSource(spark, database="test_graphs")
    src.store("team", team_graph, buckets=4, reverse_layout=True, mode="overwrite")
    yield src
    src.delete("team")
    spark.sql("DROP DATABASE IF EXISTS test_graphs CASCADE")


def test_roundtrip(bucketed, session):
    g = bucketed.graph("team")
    g._session = session
    r = g.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b"
    )
    got = sorted((m["a"], m["b"]) for m in r.to_maps())
    assert got == [("Martin", "Max"), ("Mats", "Martin"), ("Stefan", "Mats")]
    assert bucketed.graph_names() == ["team"]


def test_bucketed_join_avoids_shuffle(bucketed, session, spark):
    """With broadcast disabled, the node.id == rel.src join over co-bucketed
    tables must not exchange the bucketed sides."""
    g = bucketed.graph("team")
    g._session = session
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = g.cypher(
            "MATCH (a:German)-[:KNOWS]->(b) RETURN a.name AS a, b.name AS b"
        ).df
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_bucketed = plan.count("Exchange")

        # same query over the plain in-memory graph shuffles every join input
        from conftest import bag  # noqa: F401 (import keeps fixture layout obvious)

        assert "SortMergeJoin" in plan
        # first join (node ⋈ rel on src) is co-bucketed: at most the second
        # join's repartitioning remains
        assert n_bucketed <= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_reverse_layout(bucketed, session):
    g = bucketed.graph("team", layout="dst")
    g._session = session
    r = g.cypher("MATCH (a)<-[:KNOWS]-(b) RETURN count(*) AS c")
    assert r.to_maps() == [{"c": 3}]


def test_auto_layout_picks_reverse_copy(bucketed, session):
    g = bucketed.graph("team")  # auto
    g._session = session
    df = g.cypher("MATCH (a:German)<-[:KNOWS]-(b) RETURN a.name AS a, b.name AS b").df
    plan = df._jdf.queryExecution().executedPlan().toString()
    # reverse expand must scan the dst-bucketed physical copy
    assert "__by_dst" in plan
    got = sorted((m["a"], m["b"]) for m in [r.asDict() for r in df.collect()])
    assert got == [("Martin", "Mats"), ("Max", "Martin")]


def test_triplet_roundtrip(session, spark):
    """Triplets stored with the graph come back as zero-join pattern scans."""
    from cypher_for_apache_spark_spark.graph import (
        NodeTable,
        PropertyGraph,
        RelationshipTable,
        TripletTable,
        build_triplet_frame,
    )

    people = spark.createDataFrame(
        [(0, "Ada"), (1, "Bo")], "id long, name string"
    )
    knows = spark.createDataFrame([(10, 0, 1)], "id long, src long, dst long")
    g = PropertyGraph(
        [NodeTable.create(["Person"], people)],
        [
            RelationshipTable.create(
                "KNOWS", knows, src_labels=["Person"], dst_labels=["Person"]
            )
        ],
    )
    g.add_triplet_table(
        TripletTable.create(
            "KNOWS",
            build_triplet_frame(g, g.all_rel_tables()[0]),
            ["Person"],
            ["Person"],
        )
    )
    src = BucketedGraphSource(spark, database="test_graphs_tt")
    try:
        src.store("tg", g, buckets=2, mode="overwrite")
        g2 = src.graph("tg")
        g2._session = session
        assert len(g2.triplet_tables) == 1
        res = g2.cypher(
            "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b"
        )
        assert [tuple(r) for r in res.df.collect()] == [("Ada", "Bo")]
        plan = res.df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
    finally:
        src.delete("tg")
        spark.sql("DROP DATABASE IF EXISTS test_graphs_tt CASCADE")
