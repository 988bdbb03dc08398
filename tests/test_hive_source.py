"""Hive round-trip tests: graphs registered as catalog tables and rebuilt
by name purely from the metastore (reference: FSGraphSource.scala:56-110
hiveDatabaseName + HiveTableName.scala)."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.sources.hive import HiveGraphSource


@pytest.fixture()
def source(spark, tmp_path):
    return HiveGraphSource(spark, str(tmp_path / "graphs"), database="test_graphs")


@pytest.fixture()
def small_graph(session, spark):
    from cypher_for_apache_spark_spark.tck.create_graph import graph_from_create

    g = graph_from_create(
        spark,
        "CREATE (a:Person {name: 'Ann', age: 30})-[:KNOWS {since: 2015}]->"
        "(b:Person:Admin {name: 'Bob', age: 40}), (a)-[:LIKES]->(:Thing {tag: 'x'})",
    )
    g._session = session
    return g


def test_store_registers_catalog_tables(source, small_graph, spark):
    source.store("g1", small_graph, mode="overwrite")
    tables = [r["tableName"] for r in spark.sql("SHOW TABLES IN test_graphs").collect()]
    assert any("__node__" in t for t in tables)
    assert any("__relationship__knows" in t for t in tables)
    # tables are directly SQL-queryable (the point of Hive interop)
    node_tbl = next(t for t in tables if "person" in t and "admin" not in t)
    n = spark.sql(f"SELECT count(*) AS c FROM test_graphs.{node_tbl}").collect()[0]["c"]
    assert n == 1
    source.delete("g1")


def test_catalog_round_trip_preserves_graph(source, small_graph, session, spark):
    source.store("g2", small_graph, mode="overwrite")
    # rebuild WITHOUT schema.json: catalog metadata only
    g = source.graph_from_catalog("g2")
    g._session = session
    got = {
        (r["name"], r["knows"])
        for r in g.cypher(
            """MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(q)
               RETURN p.name AS name, q.name AS knows"""
        ).df.collect()
    }
    assert got == {("Ann", "Bob"), ("Bob", None)}
    # multi-label combination survives the round trip
    admins = g.cypher("MATCH (a:Admin) RETURN a.name AS name").df.collect()
    assert [r["name"] for r in admins] == ["Bob"]
    assert "g2" in source.catalog_graph_names()
    source.delete("g2")
    assert "g2" not in source.catalog_graph_names()


def test_delete_drops_tables(source, small_graph, spark):
    source.store("g3", small_graph, mode="overwrite")
    source.delete("g3")
    tables = [r["tableName"] for r in spark.sql("SHOW TABLES IN test_graphs").collect()]
    assert not any(t.startswith("g3__") for t in tables)
    assert not source.has_graph("g3")


def test_csv_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        HiveGraphSource(spark, str(tmp_path), fmt="csv")
