import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("cypher-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
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
