"""JDBC-backed graph source test using the Derby embedded driver that
ships with Spark's Hive support — closes the round-2 'partial: no JDBC
driver jar in env' gap. The SQL mapping (sources/sql_mapping.py) is
source-agnostic; this proves the spark.read.jdbc path end-to-end:
relational tables live in an external RDBMS, the graph is built from
JDBC reads, and Cypher runs on it."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.sources.sql_mapping import (
    NodeMapping,
    RelationshipMapping,
    build_graph,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "graphdb"
    url = f"jdbc:derby:{db};create=true"

    def write(name, df):
        df.write.format("jdbc").option("url", url).option("dbtable", name).option(
            "driver", DRIVER
        ).mode("overwrite").save()

    write(
        "people",
        spark.createDataFrame(
            [(1, "Ann", 30), (2, "Bob", 40), (3, "Cal", 50)],
            "pid int, name string, age int",
        ),
    )
    write(
        "cities",
        spark.createDataFrame(
            [(10, "Oslo"), (20, "Lima")], "cid int, cname string"
        ),
    )
    write(
        "lives_in",
        spark.createDataFrame(
            [(1, 10), (2, 10), (3, 20)], "pid int, cid int"
        ),
    )
    return url


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


def test_jdbc_graph_end_to_end(spark, session, jdbc_url):
    people = _read(spark, jdbc_url, "people")
    cities = _read(spark, jdbc_url, "cities")
    lives = _read(spark, jdbc_url, "lives_in")

    g = build_graph(
        nodes=[
            NodeMapping(["Person"], people, ["pid"], {"name": "name", "age": "age"}),
            NodeMapping(["City"], cities, ["cid"], {"name": "cname"}),
        ],
        relationships=[
            RelationshipMapping(
                "LIVES_IN", lives, ["Person"], ["pid"], ["City"], ["cid"]
            )
        ],
    )
    g._session = session
    got = {
        (r["city"], r["n"])
        for r in g.cypher(
            """MATCH (p:Person)-[:LIVES_IN]->(c:City)
               RETURN c.name AS city, count(*) AS n"""
        ).df.collect()
    }
    assert got == {("Oslo", 2), ("Lima", 1)}


def test_jdbc_predicate_pushdown(spark, jdbc_url):
    """Filters on a JDBC scan must reach the RDBMS (PushedFilters in the
    physical plan), not run Spark-side over a full table pull."""
    people = _read(spark, jdbc_url, "people").filter(F.col("age") > 35)
    plan = people._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "age" in plan
    assert people.count() == 2
