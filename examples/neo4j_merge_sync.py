"""Merge a computed graph delta back into a (simulated) live Neo4j — the
PySpark analogue of the reference's Neo4jGraphMerge usage
(morpheus-spark-cypher/.../api/io/neo4j/sync/Neo4jGraphMerge.scala): build a
graph, CONSTRUCT a derived delta with Cypher, merge it by node keys, then
re-read the remote graph and query the merged state.

The transport here is the same in-memory fake the test suite drives
(tests/test_neo4j_merge_sink.py); against a real database, replace it with
``sources.neo4j.connect(uri, user, password)``.
"""

from __future__ import annotations

from examples._common import main


def run(spark) -> None:
    import importlib.util
    import os

    from cypher_for_apache_spark_spark import CypherSession
    from cypher_for_apache_spark_spark.graph import (
        NodeTable,
        PropertyGraph,
        RelationshipTable,
    )
    from cypher_for_apache_spark_spark.sources import neo4j_sync as sync
    from cypher_for_apache_spark_spark.sources.neo4j import Neo4jGraphSource

    spec = importlib.util.spec_from_file_location(
        "neo4j_merge_fake",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "test_neo4j_merge_sink.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fake = mod.FakeNeo4j()

    # a "remote" graph already holding one person
    fake.nodes[fake._new_id()] = ({"Person"}, {"name": "alice", "city": "berlin"})

    # local analytics produce a delta: people + who-knows-whom
    people = spark.createDataFrame(
        [(0, "alice", 34), (1, "bob", 28)], "id long, name string, age long"
    )
    knows = spark.createDataFrame(
        [(0, 0, 1, 2020)], "id long, src long, dst long, since long"
    )
    delta = PropertyGraph(
        [NodeTable.create(["Person"], people)],
        [RelationshipTable.create("KNOWS", knows)],
    )

    # indexes first (node-key constraint + meta-property index), then merge
    for cmd in sync.create_indexes(fake, {"Person": {"name"}}):
        print("issued:", cmd)
    sync.merge_graph(delta, fake, node_keys={"Person": {"name"}})

    # read the merged remote state back and query it
    g = Neo4jGraphSource(spark, fake).graph()
    session = CypherSession(spark)
    session.store_graph("remote", g)
    g.cypher(
        "MATCH (a:Person)-[k:KNOWS]->(b:Person) "
        "RETURN a.name AS a, a.city AS city, k.since AS since, b.name AS b"
    ).show()
    # alice kept her pre-existing city AND gained the delta's age


if __name__ == "__main__":
    main(run)
