"""Data-source round-trip tests (reference test layer 4: FS/Hive/JDBC
round-trips, FullPGDSAcceptanceTest.scala)."""

import pytest

from cypher_for_apache_spark_spark.sources import edgelist, fs, sql_mapping


@pytest.mark.parametrize("fmt", ["parquet", "csv", "orc", "json"])
def test_fs_roundtrip(team_graph, spark, tmp_path, fmt):
    src = fs.FSGraphSource(spark, str(tmp_path / "graphs"), fmt=fmt)
    src.store("team", team_graph)
    assert src.has_graph("team")
    assert src.graph_names() == ["team"]

    g2 = src.graph("team")
    r = g2.cypher(
        "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.name AS a, b.name AS b"
    )
    got = sorted((m["a"], m["b"]) for m in r.to_maps())
    assert got == [("Martin", "Max"), ("Mats", "Martin"), ("Stefan", "Mats")]

    # schema survives: luckyNumber stays integral through csv too
    r2 = g2.cypher("MATCH (n:Swede) RETURN n.luckyNumber AS n")
    assert r2.to_maps() == [{"n": 23}]


def test_fs_delete(team_graph, spark, tmp_path):
    src = fs.FSGraphSource(spark, str(tmp_path / "graphs"))
    src.store("t", team_graph)
    src.delete("t")
    assert not src.has_graph("t")


def test_edgelist(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 2)], "src long, dst long"
    )
    g = edgelist.from_edge_df(edges)
    assert g.cypher("MATCH (v:V) RETURN count(*) AS c").to_maps() == [{"c": 3}]
    # parallel edges are preserved with distinct ids
    assert g.cypher("MATCH ()-[e:E]->() RETURN count(*) AS c").to_maps() == [{"c": 4}]
    # triangle 1->2->3->1; the duplicated 1->2 edge doubles each cycle
    r = g.cypher(
        "MATCH (a)-[:E]->()-[:E]->()-[:E]->(c) WHERE a = c RETURN count(*) AS cycles"
    )
    assert r.to_maps()[0]["cycles"] == 6


def test_edgelist_csv(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment\n1 2\n2 3\n")
    g = edgelist.from_csv(spark, str(p))
    assert g.cypher("MATCH ()-[:E]->() RETURN count(*) AS c").to_maps() == [{"c": 2}]


def test_sql_mapping_movie_graph(spark, session):
    """The reference's Graph DDL movie example (FIXTURES.md §5)."""
    person = spark.createDataFrame(
        [(1, "Keanu", 1964), (2, "Carrie", 1967)], "id long, name string, born long"
    )
    movie = spark.createDataFrame(
        [(10, "The Matrix", 1999)], "id long, title string, released long"
    )
    acted = spark.createDataFrame(
        [(1, 10), (2, 10)], "person_id long, movie_id long"
    )
    g = sql_mapping.build_graph(
        nodes=[
            sql_mapping.NodeMapping(["Person"], person, ["id"]),
            sql_mapping.NodeMapping(["Movie"], movie, ["id"]),
        ],
        relationships=[
            sql_mapping.RelationshipMapping(
                "ACTED_IN", acted, ["Person"], ["person_id"], ["Movie"], ["movie_id"]
            )
        ],
    )
    g._session = session
    r = g.cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) RETURN p.name AS actor, m.title AS title"
    )
    got = sorted((m["actor"], m["title"]) for m in r.to_maps())
    assert got == [("Carrie", "The Matrix"), ("Keanu", "The Matrix")]
