"""Selectivity-anchored pattern planning (planner._anchor_index, round 8).

The reference plans a MATCH part from its first node in written order
(okapi-logical/.../LogicalPlanner.scala planMatchPattern:309). At scale
that drags a big scan through the first join when the selective node is
written last — we anchor at the node with the best static selectivity
signal (bound variable > equality props > labels > bare) and expand
outward, flipping relationship directions for the leftward walk.
"""

import pytest

from cypher_for_apache_spark_spark import ast as A
from cypher_for_apache_spark_spark.parser import parse
from cypher_for_apache_spark_spark.plans.planner import Planner
from cypher_for_apache_spark_spark.plans.record import Record


@pytest.fixture(scope="module")
def g(session, spark):
    nodes = {
        "Big": spark.createDataFrame(
            [(i, f"b{i}", i % 7) for i in range(60)], "id long, name string, grp long"
        ),
        "Tiny": spark.createDataFrame(
            [(1000 + i, f"t{i}") for i in range(3)], "id long, name string"
        ),
    }
    rels = {
        "R": spark.createDataFrame(
            [(i, i, 1000 + (i % 3)) for i in range(60)],
            "id long, src long, dst long",
        ),
        "S": spark.createDataFrame(
            [(100 + i, 1000 + (i % 3), (i * 13) % 60) for i in range(30)],
            "id long, src long, dst long",
        ),
    }
    return session.read_from(nodes, rels)


def _match_order(spark, g, cypher_text):
    """Header insertion order of the planned MATCH == binding order."""
    planner = Planner(spark, g)
    clause = parse(cypher_text + " RETURN 1 AS one").clauses[0]
    rec = planner.plan_match(Record(None, {}), clause)
    return [v for v in rec.header if not v.startswith(" ")]


def test_prop_anchor_binds_first(spark, g):
    order = _match_order(spark, g, "MATCH (a:Big)-[:R]->(t:Tiny {name: 't0'})")
    assert order.index("t") < order.index("a")


def test_written_order_kept_on_tie(spark, g):
    order = _match_order(spark, g, "MATCH (a:Big)-[:R]->(t:Tiny)")
    assert order.index("a") < order.index("t")


def test_bound_var_anchors(spark, g):
    planner = Planner(spark, g)
    q = parse(
        "MATCH (t:Tiny {name: 't0'}) MATCH (a:Big)-[:R]->(t) RETURN 1 AS one"
    )
    rec = planner.plan_match(Record(None, {}), q.clauses[0])
    rec = planner.plan_match(rec, q.clauses[1])
    order = [v for v in rec.header if not v.startswith(" ")]
    assert order.index("t") < order.index("a")


def test_interior_anchor_expands_both_ways(spark, g):
    order = _match_order(
        spark, g, "MATCH (a:Big)-[:R]->(t:Tiny {name: 't1'})-[:S]->(b:Big)"
    )
    assert order[0] == "t"


def test_complex_props_keep_written_order(spark, g):
    # a prop referencing another pattern variable relies on left-to-right
    # binding — anchoring must not reorder
    order = _match_order(
        spark, g, "MATCH (a:Big)-[:R]->(t:Tiny {name: a.name})"
    )
    assert order.index("a") < order.index("t")


def _maps(res):
    return sorted(
        tuple(sorted(r.items())) for r in res.to_maps()
    )


@pytest.mark.parametrize(
    "written, reversed_",
    [
        (
            "MATCH (a:Big)-[r:R]->(t:Tiny {name: 't0'}) "
            "RETURN a.name AS an, t.name AS tn",
            "MATCH (t:Tiny {name: 't0'})<-[r:R]-(a:Big) "
            "RETURN a.name AS an, t.name AS tn",
        ),
        (
            "MATCH (a:Big)-[:R]->(t:Tiny {name: 't1'})-[:S]->(b:Big) "
            "RETURN a.name AS an, b.name AS bn",
            "MATCH (b:Big)<-[:S]-(t:Tiny {name: 't1'})<-[:R]-(a:Big) "
            "RETURN a.name AS an, b.name AS bn",
        ),
        (
            # undirected hop to the selective node
            "MATCH (a:Big)-[:R]-(t:Tiny {name: 't2'}) "
            "RETURN a.name AS an",
            "MATCH (t:Tiny {name: 't2'})-[:R]-(a:Big) "
            "RETURN a.name AS an",
        ),
    ],
)
def test_anchored_plan_matches_written_order(session, g, written, reversed_):
    assert _maps(session.cypher(written, graph=g)) == _maps(
        session.cypher(reversed_, graph=g)
    )


def test_anchor_scores(spark, g):
    planner = Planner(spark, g)
    rec = Record(None, {})

    def node(txt):
        return parse(f"MATCH {txt} RETURN 1 AS one").clauses[0].parts[0].nodes[0]

    bare = planner._anchor_score(rec, node("(x)"))
    labeled = planner._anchor_score(rec, node("(x:Big)"))
    propd = planner._anchor_score(rec, node("(x {name: 'n'})"))
    both = planner._anchor_score(rec, node("(x:Big {name: 'n', grp: 1})"))
    assert bare < labeled < propd < both