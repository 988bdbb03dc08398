"""Neo4j bulk-import CSV sink: layout, headers, data round-trip."""

import glob
import os

import pytest

from cypher_for_apache_spark_spark.graph import NodeTable, PropertyGraph, RelationshipTable
from cypher_for_apache_spark_spark.sources.neo4j_bulk import Neo4jBulkCSVSink


@pytest.fixture(scope="module")
def graph(spark):
    people = spark.createDataFrame(
        [(0, "Ann", 33, ["a", "b"]), (1, "Bob", 25, [])],
        "id long, name string, age long, tags array<string>",
    )
    cities = spark.createDataFrame([(10, "Oslo")], "id long, name string")
    lives = spark.createDataFrame(
        [(100, 0, 10, 2015), (101, 1, 10, 2020)],
        "id long, src long, dst long, since long",
    )
    return PropertyGraph(
        [NodeTable.create(["Person"], people), NodeTable.create(["City"], cities)],
        [RelationshipTable.create("LIVES_IN", lives)],
    )


def test_store_layout_and_headers(spark, graph, tmp_path):
    base = Neo4jBulkCSVSink(spark, str(tmp_path)).store("g", graph)
    assert open(os.path.join(base, "nodes", "Person", "schema.csv")).read().strip() == (
        "id:ID,name:string,age:int,tags:string[]"
    )
    assert open(
        os.path.join(base, "relationships", "LIVES_IN", "schema.csv")
    ).read().strip() == ":START_ID,:END_ID,since:int"
    script = open(os.path.join(base, "import.sh")).read()
    assert "--nodes:Person" in script and "--nodes:City" in script
    assert "--relationships:LIVES_IN" in script
    assert '--array-delimiter="|"' in script
    assert os.access(os.path.join(base, "import.sh"), os.X_OK)


def test_data_round_trips_through_csv(spark, graph, tmp_path):
    base = Neo4jBulkCSVSink(spark, str(tmp_path)).store("g", graph)
    parts = glob.glob(os.path.join(base, "nodes", "Person", "data", "part*.csv"))
    assert parts
    df = spark.read.schema("id long, name string, age long, tags string").csv(
        os.path.join(base, "nodes", "Person", "data")
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[0]["name"] == "Ann" and rows[0]["tags"] == "a|b"
    rels = spark.read.schema("src long, dst long, since long").csv(
        os.path.join(base, "relationships", "LIVES_IN", "data")
    )
    assert {(r["src"], r["dst"], r["since"]) for r in rels.collect()} == {
        (0, 10, 2015),
        (1, 10, 2020),
    }


def test_write_only_contract(spark, graph, tmp_path):
    sink = Neo4jBulkCSVSink(spark, str(tmp_path))
    assert not sink.has_graph("g")
    with pytest.raises(NotImplementedError):
        sink.graph("g")
