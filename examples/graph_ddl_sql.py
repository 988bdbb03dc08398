"""Map existing SQL tables to a graph with the Graph DDL text language.

Mirrors the reference's Census JDBC/Hive examples
(morpheus-examples/.../CensusJdbcExample.scala, backend-sql-graphddl.adoc):
relational views become node/relationship types declaratively; element ids
are generated from the key columns named in JOIN ON.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession

DDL = """
CREATE GRAPH people (
  Town     ( name STRING ),
  Resident ( person_id INTEGER, name STRING ),
  LIVES_IN,

  (Town)     FROM towns,
  (Resident) FROM residents,

  (Resident)-[LIVES_IN]->(Town) FROM lives_in rel
    START NODES (Resident) FROM residents r JOIN ON r.person_id = rel.person_id
    END NODES   (Town)     FROM towns t     JOIN ON t.name = rel.town
)
"""


def run(spark) -> None:
    spark.createDataFrame(
        [("Malmo",), ("Lund",)], "name string"
    ).createOrReplaceTempView("towns")
    spark.createDataFrame(
        [(1, "Nils"), (2, "Maja")], "person_id long, name string"
    ).createOrReplaceTempView("residents")
    spark.createDataFrame(
        [(1, "Malmo"), (2, "Lund")], "person_id long, town string"
    ).createOrReplaceTempView("lives_in")

    session = CypherSession(spark)
    graphs = session.create_graphs_from_ddl(DDL)
    result = graphs["people"].cypher(
        """MATCH (r:Resident)-[:LIVES_IN]->(t:Town)
           RETURN r.name AS resident, t.name AS town ORDER BY resident"""
    )
    assert result.to_maps() == [
        {"resident": "Maja", "town": "Lund"},
        {"resident": "Nils", "town": "Malmo"},
    ]


if __name__ == "__main__":
    from _common import main

    main(run)
