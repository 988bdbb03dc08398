"""Run graph algorithms over a property graph's element tables.

Mirrors the reference's GraphXPageRankExample
(morpheus-examples/.../GraphXPageRankExample.scala) — but where the
reference exports a Cypher result into GraphX, here the algorithms are
native DataFrame iterations (operators/algorithms.py), so no engine hop is
needed: the same session, the same tables.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession
from cypher_for_apache_spark_spark.operators.algorithms import (
    connected_components,
    pagerank,
)


def run(spark) -> None:
    session = CypherSession(spark)
    pages = spark.createDataFrame(
        [(0, "home"), (1, "docs"), (2, "blog"), (3, "island")],
        "id long, name string",
    )
    links = spark.createDataFrame(
        [(0, 0, 1), (1, 1, 2), (2, 2, 0), (3, 1, 0)],
        "id long, src long, dst long",
    )
    g = session.read_from(nodes={"Page": pages}, relationships={"LINKS": links})

    ranks = {r["id"]: r["rank"] for r in pagerank(g, iterations=10).collect()}
    # the island page receives only teleport + dangling mass; the cycle
    # members accumulate link mass
    assert ranks[3] < min(ranks[0], ranks[1], ranks[2])
    assert abs(sum(ranks.values()) - 4.0) < 1e-6  # mass conserved: sums to |V|

    comps = {
        r["id"]: r["component"] for r in connected_components(g).collect()
    }
    assert comps[0] == comps[1] == comps[2]
    assert comps[3] != comps[0]


if __name__ == "__main__":
    from _common import main

    main(run)
