"""Graph DDL text language -> PropertyGraph (reference: graph-ddl module,
GraphDdlParser.scala / GraphDdl.scala, backend-sql-graphddl.adoc)."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.sources.graph_ddl import (
    GraphDdlError,
    build_graph,
    graph_names,
    parse_ddl,
)

MOVIE_DDL = """
-- the documentation's Hello World example, lightly adapted
CREATE GRAPH movie_graph (

  -- element types
  Person   ( name STRING, born INTEGER ),
  Movie    ( title STRING, released INTEGER ),
  ACTED_IN ( salary FLOAT? ),

  -- node types with mapping
  (Person) FROM view_person,
  (Movie)  FROM view_movie (name AS title, year AS released),

  -- relationship types with mapping
  (Person)-[ACTED_IN]->(Movie) FROM view_appearances rel
    START NODES (Person) FROM view_person p JOIN ON p.id = rel.person_id
    END NODES   (Movie)  FROM view_movie m  JOIN ON m.id = rel.movie_id
)
"""


@pytest.fixture(scope="module")
def movie_tables(spark):
    return {
        "view_person": spark.createDataFrame(
            [(1, "Keanu", 1964), (2, "Carrie", 1967), (3, "Laurence", 1961)],
            "id long, name string, born int",
        ),
        "view_movie": spark.createDataFrame(
            [(10, "The Matrix", 1999), (11, "John Wick", 2014)],
            "id long, name string, year int",
        ),
        "view_appearances": spark.createDataFrame(
            [(1, 10, 1000.0), (2, 10, 800.0), (3, 10, 900.0), (1, 11, 2000.0)],
            "person_id long, movie_id long, salary double",
        ),
    }


@pytest.fixture(scope="module")
def movie_graph(session, movie_tables):
    g = build_graph(MOVIE_DDL, tables=movie_tables)
    g._session = session
    return g


def test_parse_structure():
    doc = parse_ddl(MOVIE_DDL)
    assert graph_names(doc) == ["movie_graph"]
    g = doc.graphs["movie_graph"]
    assert sorted(g.element_types) == ["ACTED_IN", "Movie", "Person"]
    assert g.element_types["Person"].props["name"] == ("string", False)
    assert g.element_types["ACTED_IN"].props["salary"] == ("double", True)
    assert len(g.nodes) == 2 and len(g.rels) == 1


def test_node_mapping_with_aliases(movie_graph):
    res = movie_graph.cypher(
        "MATCH (m:Movie) RETURN m.title AS t, m.released AS y ORDER BY y"
    )
    assert [tuple(r) for r in res.df.collect()] == [
        ("The Matrix", 1999),
        ("John Wick", 2014),
    ]


def test_relationship_mapping_joins(movie_graph):
    res = movie_graph.cypher(
        """MATCH (p:Person)-[a:ACTED_IN]->(m:Movie)
           RETURN p.name AS who, m.title AS movie, a.salary AS salary
           ORDER BY movie, who"""
    )
    rows = [tuple(r) for r in res.df.collect()]
    assert rows == [
        ("Keanu", "John Wick", 2000.0),
        ("Carrie", "The Matrix", 800.0),
        ("Keanu", "The Matrix", 1000.0),
        ("Laurence", "The Matrix", 900.0),
    ]


def test_endpoint_hints_from_ddl(movie_graph):
    rt = movie_graph.all_rel_tables()[0]
    assert rt.src_labels == frozenset({"Person"})
    assert rt.dst_labels == frozenset({"Movie"})


def test_graph_type_inheritance(session, movie_tables):
    ddl = """
    CREATE GRAPH TYPE movie_type (
      Person ( name STRING ),
      Movie  ( title STRING ),
      ACTED_IN,
      (Person),
      (Movie),
      (Person)-[ACTED_IN]->(Movie)
    )
    CREATE GRAPH g1 OF movie_type (
      (Person) FROM view_person,
      (Movie)  FROM view_movie (name AS title),
      (Person)-[ACTED_IN]->(Movie) FROM view_appearances rel
        START NODES (Person) FROM view_person p JOIN ON p.id = rel.person_id
        END NODES   (Movie)  FROM view_movie m  JOIN ON m.id = rel.movie_id
    )
    """
    g = build_graph(ddl, tables=movie_tables)
    g._session = session
    res = g.cypher("MATCH (p:Person)-[:ACTED_IN]->(m:Movie) RETURN count(*) AS c")
    assert res.df.collect()[0]["c"] == 4


def test_multiple_from_unions(session, spark):
    ddl = """
    CREATE GRAPH g (
      City ( name STRING ),
      (City) FROM east_cities FROM west_cities
    )
    """
    tables = {
        "east_cities": spark.createDataFrame([("Tallinn",)], "name string"),
        "west_cities": spark.createDataFrame([("Porto",), ("Lisbon",)], "name string"),
    }
    g = build_graph(ddl, tables=tables)
    g._session = session
    res = g.cypher("MATCH (c:City) RETURN c.name AS n ORDER BY n")
    assert [r["n"] for r in res.df.collect()] == ["Lisbon", "Porto", "Tallinn"]


def test_multi_label_node_type(session, spark):
    ddl = """
    CREATE GRAPH g (
      Person ( name STRING ),
      Actor  ( oscars INTEGER ),
      (Actor, Person) FROM actors
    )
    """
    tables = {
        "actors": spark.createDataFrame([("Meryl", 3)], "name string, oscars int")
    }
    g = build_graph(ddl, tables=tables)
    g._session = session
    res = g.cypher("MATCH (a:Actor:Person) RETURN a.name AS n, a.oscars AS o")
    assert [tuple(r) for r in res.df.collect()] == [("Meryl", 3)]
    res2 = g.cypher("MATCH (a:Actor) RETURN labels(a) AS l")
    assert res2.df.collect()[0]["l"] == ["Actor", "Person"]


def test_spark_catalog_resolution(session, spark, movie_tables):
    for name, df in movie_tables.items():
        df.createOrReplaceTempView(f"ddl_{name}")
    ddl = """
    CREATE GRAPH cat_graph (
      Person ( name STRING ),
      (Person) FROM ddl_view_person
    )
    """
    g = build_graph(ddl, tables=spark)
    g._session = session
    assert g.cypher("MATCH (p:Person) RETURN count(*) AS c").df.collect()[0]["c"] == 3


def test_session_create_graphs_from_ddl(session, movie_tables):
    out = session.create_graphs_from_ddl(MOVIE_DDL, tables=movie_tables)
    assert sorted(out) == ["movie_graph"]
    res = session.cypher(
        """FROM GRAPH movie_graph
           MATCH (p:Person)-[:ACTED_IN]->(:Movie {title: 'The Matrix'})
           RETURN count(*) AS c"""
    )
    assert res.df.collect()[0]["c"] == 3


def test_errors():
    with pytest.raises(GraphDdlError, match="unknown property type"):
        parse_ddl("CREATE GRAPH g ( A ( x BLOB ), (A) FROM t )")
    with pytest.raises(GraphDdlError, match="not defined"):
        build_graph("CREATE GRAPH g ( (Ghost) FROM t )", tables={})
    with pytest.raises(GraphDdlError, match="not found"):
        build_graph("CREATE GRAPH g ( A ( x STRING ), (A) FROM missing_view )", tables={})


def test_missing_column_error(spark):
    with pytest.raises(GraphDdlError, match="no column `missing`"):
        build_graph(
            "CREATE GRAPH g ( A ( missing STRING ), (A) FROM t )",
            tables={"t": spark.createDataFrame([("x",)], "present string")},
        )


def test_inconsistent_join_keys(spark):
    ddl = """
    CREATE GRAPH g (
      A ( name STRING ), R1, R2,
      (A) FROM t,
      (A)-[R1]->(A) FROM e1 rel
        START NODES (A) FROM t a JOIN ON a.k1 = rel.x
        END NODES   (A) FROM t b JOIN ON b.k1 = rel.y,
      (A)-[R2]->(A) FROM e2 rel
        START NODES (A) FROM t a JOIN ON a.k2 = rel.x
        END NODES   (A) FROM t b JOIN ON b.k1 = rel.y
    )
    """
    tables = {
        "t": spark.createDataFrame([(1, 2, "n")], "k1 long, k2 long, name string"),
        "e1": spark.createDataFrame([(1, 1)], "x long, y long"),
        "e2": spark.createDataFrame([(2, 1)], "x long, y long"),
    }
    with pytest.raises(GraphDdlError, match="inconsistent join keys"):
        build_graph(ddl, tables=tables)
