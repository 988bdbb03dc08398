"""CALL proc(args) YIELD — procedure invocation in Cypher.

Beyond reference parity: the reference has no procedure calls
(documentation/asciidoc/cypher-cypher9-features.adoc:57-76 "no
CALL ... YIELD"); this is the Neo4j/GDS idiom for composing the
distributed algorithm library (operators/algorithms.py) with patterns.
"""

import pytest

from tests.conftest import bag


@pytest.fixture(scope="module")
def chain_graph(session, spark):
    # 0 -> 1 -> 2 -> 3, plus isolated 4
    nodes = {
        "N": spark.createDataFrame(
            [(i, f"n{i}") for i in range(5)], "id long, name string"
        )
    }
    rels = {
        "NEXT": spark.createDataFrame(
            [(0, 0, 1), (1, 1, 2), (2, 2, 3)], "id long, src long, dst long"
        )
    }
    return session.read_from(nodes, rels, name="chain")


def test_standalone_call(session, chain_graph):
    out = session.cypher("CALL algo.degrees()", graph=chain_graph)
    rows = {r["id"]: r for r in out.to_maps()}
    assert rows[0]["out_degree"] == 1 and rows[0]["in_degree"] == 0
    assert rows[1]["degree"] == 2
    assert rows[4]["degree"] == 0
    assert out.df.columns == ["id", "out_degree", "in_degree", "degree"]


def test_yield_rename_and_where(session, chain_graph):
    out = session.cypher(
        "CALL algo.bfs([0]) YIELD id AS nid, dist WHERE dist > 0 "
        "RETURN nid, dist ORDER BY nid",
        graph=chain_graph,
    )
    assert out.to_maps() == [
        {"nid": 1, "dist": 1},
        {"nid": 2, "dist": 2},
        {"nid": 3, "dist": 3},
    ]


def test_compose_with_match(session, chain_graph):
    # join the yielded ids back into the pattern — the cross join + WHERE
    # equality collapses to an equi-join inside Catalyst
    out = session.cypher(
        "CALL algo.connectedComponents() YIELD id AS cid, component "
        "MATCH (n:N) WHERE id(n) = cid "
        "RETURN n.name AS name, component ORDER BY name",
        graph=chain_graph,
    )
    assert out.to_maps() == [
        {"name": "n0", "component": 0},
        {"name": "n1", "component": 0},
        {"name": "n2", "component": 0},
        {"name": "n3", "component": 0},
        {"name": "n4", "component": 4},
    ]
    plan = out.explain("physical")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_params(session, chain_graph):
    out = session.cypher(
        "CALL algo.pageRank($iters, 0.85, ['NEXT']) YIELD id, rank "
        "RETURN id, round(rank, 4) AS rank ORDER BY rank DESC, id LIMIT 2",
        parameters={"iters": 2},
        graph=chain_graph,
    )
    rows = out.to_maps()
    assert [r["id"] for r in rows] == [2, 3] or rows[0]["rank"] >= rows[1]["rank"]


def test_call_after_with_cross_join(session, chain_graph):
    # uncorrelated: every incoming row pairs with every yielded row
    out = session.cypher(
        "UNWIND [10, 20] AS x "
        "CALL algo.triangleCount() YIELD triangles "
        "RETURN x, triangles ORDER BY x",
        graph=chain_graph,
    )
    assert out.to_maps() == [
        {"x": 10, "triangles": 0},
        {"x": 20, "triangles": 0},
    ]


def test_db_procedures(session, team_graph):
    labels = session.cypher("CALL db.labels()", graph=team_graph).to_maps()
    assert {r["label"] for r in labels} == {"Person", "German", "Swede"}
    types = session.cypher(
        "CALL db.relationshipTypes()", graph=team_graph
    ).to_maps()
    assert [r["relationshipType"] for r in types] == ["KNOWS"]
    keys = session.cypher("CALL db.propertyKeys()", graph=team_graph).to_maps()
    assert {"name", "luckyNumber", "languages", "since"} <= {
        r["propertyKey"] for r in keys
    }


def test_call_inside_subquery(session, chain_graph):
    out = session.cypher(
        "CALL { CALL algo.bfs([0], 1) YIELD id, dist RETURN max(dist) AS d } "
        "RETURN d",
        graph=chain_graph,
    )
    assert out.to_maps() == [{"d": 1}]


def test_user_registered_procedure(session, chain_graph):
    def squares(ctx, n):
        return ctx.spark.range(int(n)).selectExpr(
            "id AS x", "id * id AS sq"
        )

    session.register_procedure("my.squares", squares, ["x", "sq"])
    out = session.cypher(
        "CALL my.squares(4) YIELD x, sq RETURN x, sq ORDER BY x",
        graph=chain_graph,
    )
    assert [r["sq"] for r in out.to_maps()] == [0, 1, 4, 9]


def test_errors(session, chain_graph):
    from cypher_for_apache_spark_spark.plans.planner import CypherPlanningError

    with pytest.raises(CypherPlanningError, match="unknown procedure"):
        session.cypher("CALL algo.nope() YIELD id RETURN id", graph=chain_graph).df
    with pytest.raises(CypherPlanningError, match="no output column"):
        session.cypher(
            "CALL algo.degrees() YIELD wat RETURN wat", graph=chain_graph
        ).df
    with pytest.raises(CypherPlanningError, match="collides"):
        session.cypher(
            "WITH 1 AS id CALL algo.degrees() YIELD id RETURN id",
            graph=chain_graph,
        ).df
    with pytest.raises(CypherPlanningError, match="literal or parameter"):
        session.cypher(
            "MATCH (n) CALL algo.bfs([id(n)]) YIELD id, dist RETURN dist",
            graph=chain_graph,
        ).df
    with pytest.raises(CypherPlanningError, match="arguments"):
        session.cypher(
            "CALL algo.kCore() YIELD id RETURN id", graph=chain_graph
        ).df
