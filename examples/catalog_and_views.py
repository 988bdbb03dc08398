"""Catalog-stored graphs, FROM GRAPH, and parameterized graph views.

Mirrors the reference's CatalogExample + ViewsExample
(morpheus-examples/.../CatalogExample.scala, ViewsExample.scala): register
graphs under names, query them by name, and define a parameterized Cypher
view over graphs expanded at query time.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession


def run(spark) -> None:
    session = CypherSession(spark)
    people = spark.createDataFrame(
        [(0, "Alice", 42), (1, "Bob", 17), (2, "Eve", 84)],
        "id long, name string, age long",
    )
    g = session.read_from(nodes={"Person": people})
    session.store_graph("social", g)

    by_name = session.cypher(
        "FROM GRAPH social MATCH (p:Person) RETURN count(*) AS n"
    )
    assert by_name.to_maps() == [{"n": 3}]

    session.cypher(
        """CATALOG CREATE VIEW adults($g) {
             FROM GRAPH $g
             MATCH (p:Person) WHERE p.age >= 18
             CONSTRUCT CLONE p
             RETURN GRAPH
           }"""
    )
    adults = session.cypher(
        "FROM GRAPH adults(social) MATCH (p) RETURN p.name AS name ORDER BY name"
    )
    assert [r["name"] for r in adults.to_maps()] == ["Alice", "Eve"]
    session.cypher("CATALOG DELETE VIEW adults")


if __name__ == "__main__":
    from _common import main

    main(run)
