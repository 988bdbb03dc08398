"""TCK-style acceptance harness: a Gherkin-subset scenario runner plus a
CREATE-statement graph factory, mirroring the reference's openCypher TCK
integration (morpheus-tck/.../TckSparkCypherTest.scala:40-110 runs cucumber
scenarios against ScanGraphs built by a CreateGraphFactory, with an explicit
blacklist of scenarios expected to fail)."""

from cypher_for_apache_spark_spark.tck.create_graph import graph_from_create
from cypher_for_apache_spark_spark.tck.runner import (
    Scenario,
    parse_feature,
    run_scenario,
)

__all__ = ["graph_from_create", "parse_feature", "run_scenario", "Scenario"]
