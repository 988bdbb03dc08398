"""Derive a new graph with computed properties via CONSTRUCT ... SET.

Mirrors the reference's UpdateExample
(morpheus-examples/.../UpdateExample.scala): the engine has no in-place
updates (parity with the reference, cypher-cypher9-features.adoc:57-76) —
"updates" are CONSTRUCT queries that clone elements and SET new property
values on the clones, yielding a new catalog graph.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession


def run(spark) -> None:
    session = CypherSession(spark)
    people = spark.createDataFrame(
        [(0, "Alice", 1000.0), (1, "Bob", 500.0)],
        "id long, name string, balance double",
    )
    g = session.read_from(nodes={"Person": people})
    session.store_graph("bank", g)

    with_interest = session.cypher(
        """FROM GRAPH bank
           MATCH (p:Person)
           CONSTRUCT
             CLONE p
             SET p.balance_next = p.balance * 1.05
           RETURN GRAPH"""
    )
    out = with_interest.graph.cypher(
        """MATCH (p:Person)
           RETURN p.name AS name, p.balance_next AS next ORDER BY name"""
    )
    assert out.to_maps() == [
        {"name": "Alice", "next": 1050.0},
        {"name": "Bob", "next": 525.0},
    ]


if __name__ == "__main__":
    from _common import main

    main(run)
