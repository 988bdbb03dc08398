"""pyspark-cypher: a PySpark-native property-graph / Cypher analytics engine.

A brand-new engine with the query and data-processing capabilities of
opencypher/cypher-for-apache-spark (Morpheus), designed Spark-first:

- A property graph is a set of DataFrames: one node table per label
  combination, one relationship table per type (reference data model:
  okapi-relational/.../impl/graph/ScanGraph.scala:43).
- Cypher pattern matching compiles to chains of DataFrame equi-joins;
  Catalyst/AQE does all low-level optimization.
- Element ids are plain ``LongType`` (the reference uses binary varints;
  long joins were its own JMH baseline winner — SURVEY.md §1.5).

Public API::

    from cypher_for_apache_spark_spark import CypherSession
    session = CypherSession(spark)
    g = session.read_from(nodes={...}, relationships={...})
    df = g.cypher("MATCH (a:Person)-[:KNOWS]->(b) RETURN a.name, b.name").df
"""

from cypher_for_apache_spark_spark.session import CypherSession, build_spark_session
from cypher_for_apache_spark_spark.graph import PropertyGraph, NodeTable, RelationshipTable

__all__ = [
    "CypherSession",
    "PropertyGraph",
    "NodeTable",
    "RelationshipTable",
    "build_spark_session",
]

__version__ = "0.1.0"
