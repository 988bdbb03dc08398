"""Render Cypher results for notebooks: Zeppelin %table and %network.

Mirrors the reference's DataFrameOutputExample + ZeppelinSupport
(morpheus-examples/.../DataFrameOutputExample.scala,
okapi-api/.../util/ZeppelinSupport.scala): tabular results as TSV tables,
node/relationship results as a network JSON document.
"""

from __future__ import annotations

import json

from cypher_for_apache_spark_spark import CypherSession
from cypher_for_apache_spark_spark.visualization import (
    to_zeppelin_graph_json,
    to_zeppelin_table,
)


def run(spark) -> None:
    session = CypherSession(spark)
    people = spark.createDataFrame(
        [(0, "Alice", 42), (1, "Bob", 23)], "id long, name string, age long"
    )
    knows = spark.createDataFrame([(0, 0, 1)], "id long, src long, dst long")
    g = session.read_from(nodes={"Person": people}, relationships={"KNOWS": knows})

    table = to_zeppelin_table(
        g.cypher("MATCH (p:Person) RETURN p.name AS name, p.age AS age ORDER BY name")
    )
    assert table.splitlines()[0] == "name\tage"
    assert "'Alice'\t42" in table

    net = json.loads(
        to_zeppelin_graph_json(
            g.cypher("MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a, r, b")
        )
    )
    assert {n["label"] for n in net["nodes"]} == {"Person"}
    assert len(net["nodes"]) == 2 and len(net["edges"]) == 1
    assert net["types"] == ["KNOWS"] and net["directed"] is True


if __name__ == "__main__":
    from _common import main

    main(run)
