"""Eager-aggregation (Yannakakis counting) rewrite tests.

``MATCH (u)-[:BOUGHT]->(p)<-[:SOLD]-(s) RETURN p.x, agg`` must never
materialize the buyers x sellers fan-out around a shared node: the
planner pre-aggregates each dangling branch to per-node match counts and
computes weighted aggregates over the core (planner.py ``_try_eager_agg``,
compiler.py ``compile_weighted_aggregate``).

Every test cross-checks the rewritten plan against the generic join plan
(rewrite disabled via monkeypatch) — results must be bag-equal — and the
fire/bail tests additionally assert on the physical plan (the weight
column ``eagN#mult`` only exists when the rewrite fired).
"""

import pytest

from cypher_for_apache_spark_spark.plans.planner import Planner

from conftest import bag


def _fired(result) -> bool:
    # the branch-count join key survives even when Catalyst prunes the
    # weight column (all-DISTINCT aggregates ignore multiplicity)
    import re

    plan = result.df._jdf.queryExecution().optimizedPlan().toString()
    return re.search(r"eag\d+#key", plan) is not None


@pytest.fixture(scope="module")
def shop_graph(session, spark):
    nodes = {
        "User": spark.createDataFrame(
            [(1, "u1", 25), (2, "u2", 35), (3, "u3", 45)],
            "id long, name string, age long",
        ),
        "Shop": spark.createDataFrame(
            [(10, "s1"), (11, "s2")], "id long, name string"
        ),
        "Product": spark.createDataFrame(
            [
                (20, "P1", 5.0, "toys"),
                (21, "P2", 50.0, "tools"),
                (22, "P3", 7.0, "toys"),  # buyers but no sellers
                (23, "P4", 9.0, None),  # sellers but no buyers
                (24, "Twin", 10.0, "toys"),
                (25, "Twin", 40.0, "tools"),
            ],
            "id long, name string, price double, category string",
        ),
        "Region": spark.createDataFrame([(30, "north")], "id long, name string"),
    }
    rels = {
        "BOUGHT": spark.createDataFrame(
            [
                (100, 1, 20),
                (101, 2, 20),
                (102, 3, 20),
                (103, 1, 21),
                (104, 1, 22),
                (105, 1, 24),
                (106, 2, 24),
                (107, 1, 25),
            ],
            "id long, src long, dst long",
        ),
        "SOLD": spark.createDataFrame(
            [
                (200, 10, 20),
                (201, 11, 20),
                (202, 11, 21),
                (203, 10, 23),
                (204, 10, 24),
                (205, 10, 25),
                (206, 11, 25),
            ],
            "id long, src long, dst long",
        ),
        "IN": spark.createDataFrame(
            [(300, 10, 30), (301, 11, 30)], "id long, src long, dst long"
        ),
    }
    return session.read_from(nodes, rels)


def _both_ways(monkeypatch, graph, query):
    """(rewritten result, generic result) for the same query."""
    fast = graph.cypher(query)
    with monkeypatch.context() as m:
        m.setattr(Planner, "_try_eager_agg", lambda self, m_, ret: None)
        slow = graph.cypher(query)
    assert not _fired(slow)
    return fast, slow


def test_count_star_fires_and_matches(shop_graph, monkeypatch):
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN p.name AS product, count(*) AS pairs"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)
    got = {r["product"]: r["pairs"] for r in fast.to_maps()}
    # buyers x sellers per product; zero-match products are absent
    assert got == {"P1": 6, "P2": 1, "Twin": 2 * 1 + 1 * 2}


def test_weighted_sum_min_max_avg(shop_graph, monkeypatch):
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN p.category AS cat, sum(p.price) AS total,
                  min(p.price) AS lo, max(p.price) AS hi,
                  avg(p.price) AS mean, count(p.category) AS n"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)


def test_distinct_aggregates(shop_graph, monkeypatch):
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN count(DISTINCT p.category) AS cats,
                  sum(DISTINCT p.price) AS dtotal, p.name AS name"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)


def test_order_by_aggregate_and_limit(shop_graph, monkeypatch):
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN p.name AS product, count(*) AS pairs
           ORDER BY pairs DESC, product LIMIT 2"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert [r["product"] for r in fast.to_maps()] == [
        r["product"] for r in slow.to_maps()
    ]


def test_core_where_fires(shop_graph, monkeypatch):
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           WHERE p.price > 8.0
           RETURN p.name AS product, count(*) AS pairs"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)


def test_branch_where_bails_correctly(shop_graph, monkeypatch):
    # WHERE references a branch variable -> the span widens to the chain
    # end -> generic plan; results must still be correct
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           WHERE u.age > 30
           RETURN p.name AS product, count(*) AS pairs"""
    fast = shop_graph.cypher(q)
    assert not _fired(fast)
    got = {r["product"]: r["pairs"] for r in fast.to_maps()}
    # u2,u3 x {s1,s2} on P1; u2 x {s1} on Twin(24)
    assert got == {"P1": 4, "Twin": 1}


def test_same_type_both_sides_bails(session, spark):
    # both hops scan the same FRIEND table: the cross-branch uniqueness
    # predicate (r1.id <> r2.id) is not statically vacuous -> generic plan
    nodes = {
        "Person": spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
        )
    }
    rels = {
        "FRIEND": spark.createDataFrame(
            [(100, 1, 2), (101, 3, 2)], "id long, src long, dst long"
        )
    }
    g = session.read_from(nodes, rels)
    res = g.cypher(
        """MATCH (a:Person)-[:FRIEND]->(b:Person)<-[:FRIEND]-(c:Person)
           RETURN b.name AS name, count(*) AS n"""
    )
    assert not _fired(res)
    # a->b, c->b with rel uniqueness: (a,c) and (c,a), never (a,a)
    assert bag(res) == bag([{"name": "b", "n": 2}])


def test_multi_hop_branch(shop_graph, monkeypatch):
    # suffix branch has two hops (p <- s -> region): counts per p multiply
    # through the longer chain
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)-[:IN]->(r:Region)
           RETURN p.name AS product, count(*) AS n"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)


def test_collect_bails(shop_graph, monkeypatch):
    # collect() needs one element per match -> weighted compile refuses,
    # generic plan answers
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN p.name AS product, collect(p.category) AS cats"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert not _fired(fast)
    # collect() element order is partition-dependent — compare as multisets
    norm = lambda res: {
        r["product"]: sorted(r["cats"]) for r in res.to_maps()
    }
    assert norm(fast) == norm(slow)


def test_with_aggregation_then_filter(shop_graph, monkeypatch):
    # the rewrite fires on WITH-aggregations too; downstream clauses plan
    # generically over the aggregated record
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           WITH p.name AS product, count(*) AS pairs
           WHERE pairs > 1
           RETURN product, pairs"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)
    got = {r["product"]: r["pairs"] for r in fast.to_maps()}
    assert got == {"P1": 6, "Twin": 4}


def test_distinct_projection_semi_joins(shop_graph, monkeypatch):
    # DISTINCT-only projection: branch existence is all that matters, the
    # ends become semi-joins instead of count frames
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN DISTINCT p.name AS product"""
    fast, slow = _both_ways(monkeypatch, shop_graph, q)
    assert _fired(fast)
    assert bag(fast) == bag(slow)
    assert sorted(r["product"] for r in fast.to_maps()) == ["P1", "P2", "Twin"]


def test_plain_projection_never_rewrites(shop_graph):
    # non-distinct, non-aggregate: row multiplicity IS the result
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN p.name AS product"""
    res = shop_graph.cypher(q)
    assert not _fired(res)
    assert sorted(r["product"] for r in res.to_maps()).count("P1") == 6


def test_end_var_referenced_bails(shop_graph):
    q = """MATCH (u:User)-[:BOUGHT]->(p:Product)<-[:SOLD]-(s:Shop)
           RETURN u.name AS buyer, count(*) AS n"""
    res = shop_graph.cypher(q)
    assert not _fired(res)
    got = {r["buyer"]: r["n"] for r in res.to_maps()}
    assert got == {"u1": 2 + 1 + 1 + 2, "u2": 2 + 1, "u3": 2}
