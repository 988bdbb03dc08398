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
