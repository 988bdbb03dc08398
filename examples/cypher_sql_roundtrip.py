"""Round-trip between Cypher results and Spark SQL.

Mirrors the reference's CypherSQLRoundtripExample
(morpheus-examples/.../CypherSQLRoundtripExample.scala): a Cypher result
DataFrame is registered as a SQL view, refined with spark.sql, and the SQL
output drives a second Cypher query as the driving table.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession


def run(spark) -> None:
    session = CypherSession(spark)
    people = spark.createDataFrame(
        [(0, "Alice", 42), (1, "Bob", 23), (2, "Eve", 84)],
        "id long, name string, age long",
    )
    g = session.read_from(nodes={"Person": people})
    session.store_graph("g", g)

    # Cypher -> SQL
    session.cypher("MATCH (p:Person) RETURN p.name AS name, p.age AS age") \
        .df.createOrReplaceTempView("person_ages")
    seniors = session.sql(
        "SELECT name FROM person_ages WHERE age > 40 ORDER BY name"
    )
    assert [r["name"] for r in seniors.to_maps()] == ["Alice", "Eve"]

    # SQL -> Cypher: the SQL output becomes the driving table
    drive = spark.sql("SELECT name AS target FROM person_ages WHERE age < 30")
    joined = session.cypher(
        """WITH target
           MATCH (p:Person) WHERE p.name = target
           RETURN p.name AS name, p.age AS age""",
        driving_table=drive,
    )
    assert joined.to_maps() == [{"name": "Bob", "age": 23}]


if __name__ == "__main__":
    from _common import main

    main(run)
