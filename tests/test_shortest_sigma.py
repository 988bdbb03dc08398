"""Multiplicity (sigma) plan for allShortestPaths: when the path variable
is consumed only as length(p)/size(p) under aggregation, the planner must
count shortest paths per endpoint pair (betweenness-style sigma sweep)
instead of materializing one row per path — and the counts must agree with
the per-path plan on every random graph tried (self-loops, parallel edges,
directed and undirected)."""

import random

import pytest

from cypher_for_apache_spark_spark import ast as A
from cypher_for_apache_spark_spark.plans.planner import Planner


def _graph(session, spark, rng, n, m, parallel=False):
    nodes = {
        "N": spark.createDataFrame(
            [(i, f"n{i}") for i in range(n)], "id long, name string"
        )
    }
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    if not parallel:
        edges = list(dict.fromkeys(edges))
    rels = {
        "E": spark.createDataFrame(
            [(100 + i, s, d) for i, (s, d) in enumerate(edges)],
            "id long, src long, dst long",
        )
    }
    return session.read_from(nodes, rels)


def rows(g, q):
    return sorted(tuple(r) for r in g.cypher(q).df.collect())


SIGMA_Q = (
    "MATCH p = allShortestPaths((a:N)-[:E*1..3]-(b:N)) "
    "RETURN length(p) AS l, count(*) AS c"
)
# `WITH p` references the path variable bare, so the sigma rewrite must
# NOT fire — this is the per-path reference plan
PERPATH_Q = (
    "MATCH p = allShortestPaths((a:N)-[:E*1..3]-(b:N)) "
    "WITH p RETURN length(p) AS l, count(*) AS c"
)


def test_sigma_plan_fires_and_perpath_does_not(session, spark):
    g = _graph(session, spark, random.Random(1), 5, 8)
    plan_sigma = g.cypher(SIGMA_Q).df._jdf.queryExecution().optimizedPlan().toString()
    plan_paths = g.cypher(PERPATH_Q).df._jdf.queryExecution().optimizedPlan().toString()
    assert "#sigma" in plan_sigma and "#ids" not in plan_sigma
    assert "#ids" in plan_paths and "#sigma" not in plan_paths


@pytest.mark.parametrize("seed", [2, 11, 29, 47])
def test_sigma_counts_match_perpath_undirected(session, spark, seed):
    rng = random.Random(seed)
    g = _graph(session, spark, rng, rng.randint(4, 8), rng.randint(5, 14))
    assert rows(g, SIGMA_Q) == rows(g, PERPATH_Q)


@pytest.mark.parametrize("seed", [3, 13])
def test_sigma_counts_match_perpath_directed(session, spark, seed):
    rng = random.Random(seed)
    g = _graph(session, spark, rng, rng.randint(4, 8), rng.randint(5, 14))
    q_dir = SIGMA_Q.replace("]-(b:N)", "]->(b:N)")
    q_ref = PERPATH_Q.replace("]-(b:N)", "]->(b:N)")
    assert rows(g, q_dir) == rows(g, q_ref)


@pytest.mark.parametrize("seed", [5, 19])
def test_sigma_counts_match_with_parallel_edges_and_loops(session, spark, seed):
    # parallel edges make distinct shortest trails between the same pair;
    # self-loops and immediate back-steps exercise the trail filter
    rng = random.Random(seed)
    g = _graph(session, spark, rng, rng.randint(3, 5), rng.randint(8, 16), parallel=True)
    assert rows(g, SIGMA_Q) == rows(g, PERPATH_Q)


def test_sigma_with_where_and_grouping_keys(session, spark):
    rng = random.Random(7)
    g = _graph(session, spark, rng, 6, 10)
    q1 = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..2]-(b:N)) WHERE id(a) < id(b) "
        "RETURN a.name AS n, length(p) AS l, count(*) AS c"
    )
    q2 = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..2]-(b:N)) WHERE id(a) < id(b) "
        "WITH a, p RETURN a.name AS n, length(p) AS l, count(*) AS c"
    )
    assert rows(g, q1) == rows(g, q2)


def test_sigma_zero_length_lower_bound(session, spark):
    rng = random.Random(9)
    g = _graph(session, spark, rng, 5, 8)
    q1 = (
        "MATCH p = allShortestPaths((a:N)-[:E*0..2]-(b:N)) "
        "RETURN length(p) AS l, count(*) AS c"
    )
    q2 = (
        "MATCH p = allShortestPaths((a:N)-[:E*0..2]-(b:N)) "
        "WITH p RETURN length(p) AS l, count(*) AS c"
    )
    assert rows(g, q1) == rows(g, q2)


def test_sigma_weighted_sum_and_avg(session, spark):
    rng = random.Random(15)
    g = _graph(session, spark, rng, 6, 11)
    q1 = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..3]-(b:N)) "
        "RETURN sum(length(p)) AS s, avg(length(p)) AS m, count(*) AS c, "
        "min(length(p)) AS lo, max(length(p)) AS hi"
    )
    q2 = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..3]-(b:N)) "
        "WITH p RETURN sum(length(p)) AS s, avg(length(p)) AS m, count(*) AS c, "
        "min(length(p)) AS lo, max(length(p)) AS hi"
    )
    assert rows(g, q1) == rows(g, q2)


def test_sigma_distinct_projection(session, spark):
    rng = random.Random(21)
    g = _graph(session, spark, rng, 6, 10)
    q1 = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..2]-(b:N)) "
        "RETURN DISTINCT a.name AS n, length(p) AS l"
    )
    q2 = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..2]-(b:N)) "
        "WITH a, p RETURN DISTINCT a.name AS n, length(p) AS l"
    )
    assert rows(g, q1) == rows(g, q2)


def test_collect_of_lengths_falls_back_to_perpath(session, spark):
    # collect() is not weight-expressible: the rewrite must decline and the
    # generic plan must still answer (with one element per path)
    rng = random.Random(25)
    g = _graph(session, spark, rng, 5, 8)
    q = (
        "MATCH p = allShortestPaths((a:N)-[:E*1..2]-(b:N)) "
        "RETURN a.name AS n, collect(length(p)) AS ls"
    )
    plan = g.cypher(q).df._jdf.queryExecution().optimizedPlan().toString()
    assert "#ids" in plan
    got = {r["n"]: sorted(r["ls"]) for r in g.cypher(q).df.collect()}
    ref = {}
    for r in g.cypher(
        "MATCH p = allShortestPaths((a:N)-[:E*1..2]-(b:N)) "
        "WITH a, p RETURN a.name AS n, length(p) AS l"
    ).df.collect():
        ref.setdefault(r["n"], []).append(r["l"])
    assert got == {k: sorted(v) for k, v in ref.items()}
