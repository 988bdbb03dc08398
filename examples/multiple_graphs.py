"""Multiple-graph query: compose two graphs, CONSTRUCT a third, query it.

Mirrors the reference's MultipleGraphExample
(morpheus-examples/.../MultipleGraphExample.scala): a social graph and a
purchase graph are joined by a CONSTRUCT that creates new edges between
customers and the products their friends bought.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession


def run(spark) -> None:
    session = CypherSession(spark)
    persons = spark.createDataFrame(
        [(0, "Alice"), (1, "Bob")], "id long, name string"
    )
    knows = spark.createDataFrame([(0, 0, 1)], "id long, src long, dst long")
    session.store_graph(
        "social",
        session.read_from(nodes={"Person": persons}, relationships={"KNOWS": knows}),
    )

    customers = spark.createDataFrame(
        [(10, "Alice"), (11, "Bob")], "id long, name string"
    )
    products = spark.createDataFrame(
        [(20, "Vinyl"), (21, "Tape")], "id long, name string"
    )
    bought = spark.createDataFrame(
        [(0, 10, 20), (1, 11, 21)], "id long, src long, dst long"
    )
    session.store_graph(
        "purchases",
        session.read_from(
            nodes={"Customer": customers, "Product": products},
            relationships={"BOUGHT": bought},
        ),
    )

    # link persons to same-named customers, clone the purchase edges into a
    # recommendation graph
    linked = session.cypher(
        """FROM GRAPH social
           MATCH (p:Person)
           FROM GRAPH purchases
           MATCH (c:Customer)-[b:BOUGHT]->(prod:Product)
           WHERE p.name = c.name
           CONSTRUCT
             CLONE p, prod
             NEW (p)-[:SHOULD_LIKE]->(prod)
           RETURN GRAPH"""
    )
    recs = linked.graph.cypher(
        """MATCH (p:Person)-[:SHOULD_LIKE]->(prod:Product)
           RETURN p.name AS person, prod.name AS product ORDER BY person"""
    )
    assert recs.to_maps() == [
        {"person": "Alice", "product": "Vinyl"},
        {"person": "Bob", "product": "Tape"},
    ]


if __name__ == "__main__":
    from _common import main

    main(run)
