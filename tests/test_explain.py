"""Plan-introspection surface: CypherResult.explain exposes the physical
plan, and the plans it shows carry the scale-critical properties the
engine claims — predicate pushdown into parquet scans and column
pruning."""

import pytest


@pytest.fixture(scope="module")
def fs_graph(session, spark, tmp_path_factory):
    """A parquet-backed graph (pushdown needs a file source, not
    createDataFrame's in-memory relation)."""
    from cypher_for_apache_spark_spark.graph import NodeTable, PropertyGraph
    from cypher_for_apache_spark_spark.sources.fs import FSGraphSource

    root = str(tmp_path_factory.mktemp("expl"))
    nodes = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(100)],
        "id long, name string, score long",
    )
    g = PropertyGraph([NodeTable.create(["Item"], nodes)], [])
    src = FSGraphSource(spark, root)
    src.store("items", g)
    out = src.graph("items")
    out._session = session
    return out


def test_explain_modes(fs_graph):
    res = fs_graph.cypher("MATCH (i:Item) RETURN i.name AS name")
    assert "FileScan" in res.explain("physical")
    assert "Physical Plan" in res.explain("formatted")
    assert "Parsed Logical Plan" in res.explain("extended")


def test_property_predicate_pushes_into_scan(fs_graph):
    res = fs_graph.cypher(
        "MATCH (i:Item) WHERE i.score > 500 RETURN i.name AS name"
    )
    plan = res.explain("physical")
    assert "PushedFilters" in plan and "score" in plan.split("PushedFilters")[1][:200]


def test_projection_prunes_scan_columns(fs_graph):
    res = fs_graph.cypher("MATCH (i:Item) RETURN i.name AS name")
    plan = res.explain("physical")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "name" in read_schema and "score" not in read_schema
