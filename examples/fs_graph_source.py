"""Persist a graph to a filesystem data source and read it back by name.

Mirrors the reference's DataSourceExample
(morpheus-examples/.../DataSourceExample.scala + FSGraphSource.scala:56-110):
the graph lands as one parquet directory per label combination / rel type
plus a schema JSON, then is reloaded and queried.
"""

from __future__ import annotations

import shutil
import tempfile

from cypher_for_apache_spark_spark import CypherSession
from cypher_for_apache_spark_spark.sources.fs import FSGraphSource


def run(spark) -> None:
    session = CypherSession(spark)
    people = spark.createDataFrame(
        [(0, "Alice"), (1, "Bob")], "id long, name string"
    )
    knows = spark.createDataFrame([(0, 0, 1)], "id long, src long, dst long")
    g = session.read_from(nodes={"Person": people}, relationships={"KNOWS": knows})

    root = tempfile.mkdtemp(prefix="fs_graph_example_")
    try:
        source = FSGraphSource(spark, root, fmt="parquet")
        source.store("social", g)
        assert source.has_graph("social")

        reloaded = source.graph("social")
        reloaded._session = session
        result = reloaded.cypher(
            """MATCH (a:Person)-[:KNOWS]->(b:Person)
               RETURN a.name AS a, b.name AS b"""
        )
        assert result.to_maps() == [{"a": "Alice", "b": "Bob"}]
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    from _common import main

    main(run)
