"""CALL { } subquery equivalences on random graphs: the set-based
lowering must agree with the classic non-subquery formulations of the
same questions, for every random graph tried."""

import random

import pytest


def _graph(session, spark, rng, n, m):
    nodes = {
        "N": spark.createDataFrame(
            [(i, f"n{i}", rng.randint(0, 50)) for i in range(n)],
            "id long, name string, age long",
        )
    }
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    rels = {
        "E": spark.createDataFrame(
            [(100 + i, s, d) for i, (s, d) in enumerate(edges)],
            "id long, src long, dst long",
        )
    }
    return session.read_from(nodes, rels)


def rows(g, q):
    return sorted(tuple(r) for r in g.cypher(q).df.collect())


@pytest.mark.parametrize("seed", [3, 17, 40])
def test_correlated_count_equals_optional_match_formulation(session, spark, seed):
    rng = random.Random(seed)
    g = _graph(session, spark, rng, rng.randint(4, 8), rng.randint(4, 12))
    via_call = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) RETURN count(q) AS c } "
        "RETURN p.name AS n, c",
    )
    classic = rows(
        g,
        "MATCH (p:N) OPTIONAL MATCH (p)-[:E]->(q) "
        "RETURN p.name AS n, count(q) AS c",
    )
    assert via_call == classic


@pytest.mark.parametrize("seed", [5, 23])
def test_row_multiplying_call_equals_plain_match(session, spark, seed):
    rng = random.Random(seed)
    g = _graph(session, spark, rng, rng.randint(4, 8), rng.randint(4, 12))
    via_call = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) RETURN q.name AS qn } "
        "RETURN p.name AS n, qn",
    )
    classic = rows(g, "MATCH (p:N)-[:E]->(q) RETURN p.name AS n, q.name AS qn")
    assert via_call == classic


@pytest.mark.parametrize("seed", [7, 31])
def test_per_row_topk_equals_window_semantics(session, spark, seed):
    rng = random.Random(seed)
    g = _graph(session, spark, rng, rng.randint(5, 9), rng.randint(6, 14))
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "RETURN q.age AS a ORDER BY q.age DESC, q.name LIMIT 2 } "
        "RETURN p.name AS n, a",
    )
    # reference: compute per-source top-2 ages from the full expansion
    full = g.cypher(
        "MATCH (p:N)-[:E]->(q) RETURN p.name AS n, q.age AS a, q.name AS qn"
    ).df.collect()
    per = {}
    for r in full:
        per.setdefault(r["n"], []).append((-r["a"], r["qn"]))
    want = sorted(
        (n, -a) for n, lst in per.items() for a, _ in sorted(lst)[:2]
    )
    assert got == want


def test_mixed_agg_nonagg_return_drops_zero_match_rows(session, spark):
    """Neo4j: RETURN q.name AS qn, count(q) AS c inside a correlated CALL
    is a GROUPED aggregate — zero matches produce no groups, so the input
    row is eliminated (NOT kept with (qn=null, c=0))."""
    nodes = {
        "N": spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "lonely")], "id long, name string"
        )
    }
    rels = {
        "E": spark.createDataFrame(
            [(100, 0, 1), (101, 0, 1)], "id long, src long, dst long"
        )
    }
    g = session.read_from(nodes, rels)
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "RETURN q.name AS qn, count(q) AS c } RETURN p.name AS n, qn, c",
    )
    assert got == [("a", "b", 2)]  # 'b' and 'lonely' have no out-edges


def test_all_agg_return_keeps_zero_match_rows_with_fills(session, spark):
    nodes = {
        "N": spark.createDataFrame(
            [(0, "a", 5), (1, "lonely", 7)], "id long, name string, age long"
        )
    }
    rels = {
        "E": spark.createDataFrame([(100, 0, 0)], "id long, src long, dst long")
    }
    g = session.read_from(nodes, rels)
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "RETURN count(q) AS c, sum(q.age) AS s, min(q.age) AS m } "
        "RETURN p.name AS n, c, s, m",
    )
    # zero-match: count/sum fill 0, min fills null (openCypher empty agg)
    assert got == [("a", 1, 5, 5), ("lonely", 0, 0, None)]


def test_composite_aggregate_fills_through_composition(session, spark):
    """``RETURN count(q) + 1`` in a zero-match correlated CALL folds the
    empty-aggregate value through the composition (0 + 1 = 1)."""
    nodes = {
        "N": spark.createDataFrame(
            [(0, "a"), (1, "lonely")], "id long, name string"
        )
    }
    rels = {
        "E": spark.createDataFrame(
            [(100, 0, 0), (101, 0, 1)], "id long, src long, dst long"
        )
    }
    g = session.read_from(nodes, rels)
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "RETURN count(q) + 1 AS c, size(collect(q.name)) AS s } "
        "RETURN p.name AS n, c, s",
    )
    assert sorted(got) == [("a", 3, 2), ("lonely", 1, 0)]


def test_composite_aggregate_implicit_grouping_raises(session, spark):
    """A variable composed with an aggregate outside the aggregate is an
    implicit grouping expression — Neo4j rejects the query; so do we."""
    from cypher_for_apache_spark_spark.plans.planner import CypherPlanningError

    nodes = {"N": spark.createDataFrame([(0, "a")], "id long, name string")}
    rels = {
        "E": spark.createDataFrame([(100, 0, 0)], "id long, src long, dst long")
    }
    g = session.read_from(nodes, rels)
    with pytest.raises(CypherPlanningError, match="implicit grouping"):
        g.cypher(
            "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
            "RETURN count(q) + p.id AS c } RETURN p.name AS n, c"
        ).df.collect()


def test_intermediate_all_aggregate_with_keeps_zero_match_rows(session, spark):
    """``WITH count(q) AS c`` inside a correlated CALL has no grouping keys
    in Neo4j: every input row yields one aggregate row, zero-match rows
    included (c = 0), and downstream clauses see it."""
    nodes = {
        "N": spark.createDataFrame(
            [(0, "a"), (1, "lonely")], "id long, name string"
        )
    }
    rels = {
        "E": spark.createDataFrame(
            [(100, 0, 0), (101, 0, 1)], "id long, src long, dst long"
        )
    }
    g = session.read_from(nodes, rels)
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "WITH count(q) AS c RETURN c * 10 AS d } RETURN p.name AS n, d",
    )
    assert sorted(got) == [("a", 20), ("lonely", 0)]


def test_intermediate_aggregate_with_where_filters_after_fill(session, spark):
    """WHERE on the aggregate WITH filters the FILLED row — a zero-match
    input passes ``WHERE c = 0`` and is eliminated by ``WHERE c > 0``."""
    nodes = {
        "N": spark.createDataFrame(
            [(0, "a"), (1, "lonely")], "id long, name string"
        )
    }
    rels = {
        "E": spark.createDataFrame(
            [(100, 0, 0), (101, 0, 1)], "id long, src long, dst long"
        )
    }
    g = session.read_from(nodes, rels)
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "WITH count(q) AS c WHERE c = 0 RETURN c } RETURN p.name AS n, c",
    )
    assert got == [("lonely", 0)]
    got2 = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "WITH count(q) AS c WHERE c > 0 RETURN c } RETURN p.name AS n, c",
    )
    assert got2 == [("a", 2)]


def test_intermediate_with_explicit_grouping_key_still_works(session, spark):
    """WITH q.name AS qn, count(q) AS c has a user grouping key — per-row
    grouped semantics are preserved by threading imports in; zero-match
    elimination matches Neo4j (grouped agg over zero rows -> no rows)."""
    nodes = {
        "N": spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "lonely")], "id long, name string"
        )
    }
    rels = {
        "E": spark.createDataFrame(
            [(100, 0, 1), (101, 0, 1), (102, 1, 0)], "id long, src long, dst long"
        )
    }
    g = session.read_from(nodes, rels)
    got = rows(
        g,
        "MATCH (p:N) CALL { WITH p MATCH (p)-[:E]->(q) "
        "WITH q.name AS qn, count(q) AS c WHERE c > 0 RETURN qn, c } "
        "RETURN p.name AS n, qn, c",
    )
    assert got == [("a", "b", 2), ("b", "a", 1)]
