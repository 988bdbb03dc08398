"""Build a property graph from plain DataFrames and query it with Cypher.

Mirrors the reference's DataFrameInputExample / CustomDataFrameInputExample
(morpheus-examples/.../DataFrameInputExample.scala): social graph in two
DataFrames, one Cypher query over the result.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession


def run(spark) -> None:
    persons = spark.createDataFrame(
        [(0, "Alice", 42), (1, "Bob", 23), (2, "Eve", 84)],
        "id long, name string, age long",
    )
    friendships = spark.createDataFrame(
        [(0, 0, 1, "red"), (1, 1, 2, "blue")],
        "id long, src long, dst long, since string",
    )

    session = CypherSession(spark)
    graph = session.read_from(
        nodes={"Person": persons}, relationships={"KNOWS": friendships}
    )

    result = graph.cypher(
        """MATCH (a:Person)-[r:KNOWS]->(b)
           RETURN a.name AS person, b.name AS friend, r.since AS since
           ORDER BY person"""
    )
    result.show()
    assert result.to_maps() == [
        {"person": "Alice", "friend": "Bob", "since": "red"},
        {"person": "Bob", "friend": "Eve", "since": "blue"},
    ]


if __name__ == "__main__":
    from _common import main

    main(run)
