import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    # built through the library's session builder so the suite exercises
    # the product configuration — including the static
    # dataFrameDebugging=false conf (3x faster driver-side plan builds;
    # the suite is dominated by exactly that work)
    from cypher_for_apache_spark_spark import build_spark_session

    s = build_spark_session(
        master="local[4]",
        app_name="cypher-spark-tests",
        extra_confs={
            "spark.sql.shuffle.partitions": "4",
            "spark.sql.session.timeZone": "UTC",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def session(spark):
    from cypher_for_apache_spark_spark import CypherSession

    return CypherSession(spark)


@pytest.fixture(scope="session")
def team_graph(session, spark):
    """The reference's canonical TeamDataFixture
    (morpheus-testing/.../fixture/TeamDataFixture.scala:68-105, FIXTURES.md §1)."""
    nodes = {
        ("Person", "German"): spark.createDataFrame(
            [
                (0, "Stefan", 42, ["German", "English", "Klingon"]),
                (2, "Martin", 1337, None),
                (3, "Max", 8, None),
            ],
            "id long, name string, luckyNumber long, languages array<string>",
        ),
        ("Person", "Swede"): spark.createDataFrame(
            [(1, "Mats", 23)], "id long, name string, luckyNumber long"
        ),
        ("Person",): spark.createDataFrame(
            [(4, "Donald", 8, [])],
            "id long, name string, luckyNumber long, languages array<string>",
        ),
    }
    rels = {
        "KNOWS": spark.createDataFrame(
            [(0, 0, 1, 2016), (1, 1, 2, 2016), (2, 2, 3, 2016)],
            "id long, src long, dst long, since long",
        )
    }
    return session.read_from(nodes, rels)


def bag(result):
    """Multiset compare helper: sorted list of sorted dict items."""
    rows = result.to_maps() if hasattr(result, "to_maps") else result
    def key(d):
        return sorted((k, repr(v)) for k, v in d.items())
    return sorted(rows, key=key)
