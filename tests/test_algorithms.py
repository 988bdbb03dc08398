"""Graph algorithm tests (DataFrame-native PageRank/CC/triangles/degrees)."""

import pytest

from cypher_for_apache_spark_spark.operators import algorithms as alg
from cypher_for_apache_spark_spark.sources import edgelist


@pytest.fixture(scope="module")
def star_graph(spark):
    # 1..5 all point at 0; 0 points at 1 (so 0 isn't dangling)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], "src long, dst long"
    )
    return edgelist.from_edge_df(edges)


@pytest.fixture(scope="module")
def two_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    return edgelist.from_edge_df(edges)


def test_pagerank_star(star_graph):
    ranks = {r["id"]: r["rank"] for r in alg.pagerank(star_graph, iterations=15).collect()}
    assert len(ranks) == 6
    # hub gets the highest rank; spokes 2..5 are symmetric
    assert ranks[0] == max(ranks.values())
    spoke_vals = [ranks[i] for i in range(2, 6)]
    assert max(spoke_vals) - min(spoke_vals) < 1e-9
    # total mass conserved: sums to |V|
    assert abs(sum(ranks.values()) - 6.0) < 1e-6


def test_connected_components(two_components):
    cc = {r["id"]: r["component"] for r in alg.connected_components(two_components).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10
    assert cc[1] != cc[10]


def test_triangle_count(spark):
    # one triangle (1,2,3) plus a dangling edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    g = edgelist.from_edge_df(edges)
    assert alg.triangle_count(g).collect()[0]["triangles"] == 1


def test_degrees(two_components):
    d = {r["id"]: r for r in alg.degrees(two_components).collect()}
    assert d[2]["in_degree"] == 1 and d[2]["out_degree"] == 1 and d[2]["degree"] == 2
    assert d[11]["out_degree"] == 0 and d[11]["in_degree"] == 1


def test_bfs_distances_chain(spark):
    # directed chain 1 -> 2 -> 3 -> 4, plus unreachable 10 -> 11
    g = edgelist.from_edge_df(
        spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long")
    )
    d = {r["id"]: r["dist"] for r in alg.bfs_distances(g, [1]).collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 3}  # unreachable nodes omitted


def test_bfs_distances_undirected_and_max_hops(spark):
    g = edgelist.from_edge_df(
        spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    )
    d = {r["id"]: r["dist"] for r in alg.bfs_distances(g, [3], undirected=True).collect()}
    assert d == {3: 0, 2: 1, 4: 1, 1: 2}
    capped = {r["id"]: r["dist"] for r in alg.bfs_distances(g, [1], max_hops=1).collect()}
    assert capped == {1: 0, 2: 1}


def test_bfs_multi_source_min_dist(spark):
    # sources 1 and 4 meet in the middle; each node gets the MIN distance
    g = edgelist.from_edge_df(
        spark.createDataFrame([(1, 2), (2, 3), (4, 3)], "src long, dst long")
    )
    d = {r["id"]: r["dist"] for r in alg.bfs_distances(g, [1, 4]).collect()}
    assert d == {1: 0, 4: 0, 2: 1, 3: 1}


def test_k_core_peels_tail(spark):
    """Triangle {1,2,3} with a tail 3-4-5: the 2-core is the triangle
    only (4 and 5 peel off transitively)."""
    from cypher_for_apache_spark_spark.operators import algorithms as alg2
    from cypher_for_apache_spark_spark.sources import edgelist as el

    g = el.from_edge_df(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
        )
    )
    core = {r["id"]: r["degree"] for r in alg2.k_core(g, k=2).collect()}
    assert core == {1: 2, 2: 2, 3: 2}
    # 1-core keeps everything (every vertex has degree >= 1)
    assert sorted(r["id"] for r in alg2.k_core(g, k=1).collect()) == [1, 2, 3, 4, 5]
    # 3-core of this graph is empty
    assert alg2.k_core(g, k=3).count() == 0


def test_k_core_two_components(spark):
    from cypher_for_apache_spark_spark.operators import algorithms as alg2
    from cypher_for_apache_spark_spark.sources import edgelist as el

    # K4 on {1..4} plus a path 10-11-12: 3-core = the K4 exactly
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    g = el.from_edge_df(
        spark.createDataFrame(k4 + [(10, 11), (11, 12)], "src long, dst long")
    )
    core3 = sorted(r["id"] for r in alg2.k_core(g, k=3).collect())
    assert core3 == [1, 2, 3, 4]


def test_sssp_weighted_chain(spark):
    # 1 -2.0-> 2 -2.0-> 3 and a heavy shortcut 1 -5.0-> 3: path via 2 wins
    edges = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 2.0), (1, 3, 5.0), (4, 5, 1.0)],
        "src long, dst long, w double",
    )
    g = edgelist.from_edge_df(edges)
    d = {r["id"]: r["dist"] for r in alg.sssp(g, [1], weight_prop="w").collect()}
    assert d == {1: 0.0, 2: 2.0, 3: 4.0}  # 4,5 unreachable: absent


def test_sssp_default_weight_matches_bfs(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    g = edgelist.from_edge_df(edges)
    d = {r["id"]: r["dist"] for r in alg.sssp(g, [1]).collect()}
    b = {r["id"]: float(r["dist"]) for r in alg.bfs_distances(g, [1]).collect()}
    assert d == b  # unweighted sssp == hop counts


def test_sssp_multi_source_min(spark):
    edges = spark.createDataFrame(
        [(1, 3, 10.0), (2, 3, 1.0)], "src long, dst long, w double"
    )
    g = edgelist.from_edge_df(edges)
    d = {r["id"]: r["dist"] for r in alg.sssp(g, [1, 2], weight_prop="w").collect()}
    assert d[3] == 1.0  # nearest source wins


def test_clustering_coefficient_edges(spark):
    from cypher_for_apache_spark_spark.operators.algorithms import (
        clustering_coefficient_edges,
    )

    # triangle 1-2-3 plus pendant 4 attached to 1; duplicate + reversed
    # edges must not double-count
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 1), (4, 1)], "src long, dst long"
    )
    got = {r["id"]: r for r in clustering_coefficient_edges(edges).collect()}
    assert got[1]["degree"] == 3 and got[1]["triangles"] == 1
    assert got[1]["coeff"] == round(2 * 1 / (3 * 2), 6)
    assert got[2]["coeff"] == 1.0 and got[3]["coeff"] == 1.0
    assert got[4]["degree"] == 1 and got[4]["coeff"] == 0.0


def test_label_propagation_two_cliques(spark):
    # two 4-cliques joined by one bridge edge: labels converge to the
    # minimum id within each clique; the bridge does not merge them
    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
        "src long, dst long",
    )
    out = {r["id"]: r["label"] for r in alg.label_propagation_edges(edges, 4).collect()}
    assert all(out[i] == 1 for i in [1, 2, 3, 4])
    assert all(out[i] == 10 for i in [10, 11, 12, 13])


def test_label_propagation_deterministic_tiebreak(spark):
    # node 2 sees labels {1, 3} once each -> smaller label wins every round
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r["id"]: r["label"] for r in alg.label_propagation_edges(edges, 1).collect()}
    assert out[2] == 1
    # endpoints adopt their only neighbor's label
    assert out[1] == 2 and out[3] == 2


def test_random_walks_chain(spark):
    # deterministic: on a directed chain every node has exactly 1
    # out-edge, so the walk is forced and the hash pick is always index 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    starts = spark.createDataFrame([(1,)], "id long")
    rows = alg.random_walks(edges, starts, walk_length=3, walks_per_node=2).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk"], {})[r["step"]] = r["node"]
    assert set(by_walk) == {0, 1}
    for w in by_walk.values():
        assert [w[s] for s in sorted(w)] == [1, 2, 3, 4]


def test_random_walks_stop_at_sink_and_replay(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    starts = spark.createDataFrame([(1,), (3,)], "id long")
    out = alg.random_walks(edges, starts, walk_length=4, walks_per_node=1)
    rows = [(r["start"], r["step"], r["node"]) for r in out.collect()]
    # node 3 has no out-edges: its walk is just step 0
    assert (3, 0, 3) in rows and not any(s == 3 and st > 0 for s, st, _ in rows)
    # walk from 1 ends at 3 after 2 steps and stops
    assert (1, 2, 3) in rows and not any(s == 1 and st > 2 for s, st, _ in rows)
    # same inputs -> identical walks (hash-seeded, no RNG state)
    again = [(r["start"], r["step"], r["node"]) for r in
             alg.random_walks(edges, starts, walk_length=4, walks_per_node=1).collect()]
    assert sorted(rows) == sorted(again)


def test_random_walks_picks_vary(spark):
    # star with many out-edges: across walks/steps the hash picks must
    # not all collapse to the same neighbor
    edges = spark.createDataFrame(
        [(0, d) for d in range(1, 9)] + [(d, 0) for d in range(1, 9)],
        "src long, dst long",
    )
    starts = spark.createDataFrame([(0,)], "id long")
    rows = alg.random_walks(edges, starts, walk_length=5, walks_per_node=4).collect()
    picked = {r["node"] for r in rows if r["step"] % 2 == 1}
    assert len(picked) >= 3


def test_scc_cycle_with_tail(spark):
    # 1 -> 2 -> 3 -> 1 cycle, 3 -> 4 tail: SCC {1,2,3} plus singleton {4}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = {r["id"]: r["component"]
           for r in alg.strongly_connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4}


def test_scc_two_cycles_bridged(spark):
    # two 2-cycles joined by a one-way bridge stay separate SCCs
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3)], "src long, dst long"
    )
    out = {r["id"]: r["component"]
           for r in alg.strongly_connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}


def test_scc_dag_all_singletons(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    out = {r["id"]: r["component"]
           for r in alg.strongly_connected_components(edges).collect()}
    assert out == {i: i for i in [1, 2, 3, 4]}


def test_scc_single_edge_tight_rounds(spark):
    # settles entirely on the last permitted round: must NOT raise
    # (ADVICE r3: the for/else raised even when the graph converged)
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = {r["id"]: r["component"]
           for r in alg.strongly_connected_components(edges, max_rounds=2).collect()}
    assert out == {1: 1, 2: 2}


def test_scc_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    df = alg.strongly_connected_components(edges)
    assert df.columns == ["id", "component"]
    assert df.count() == 0


def test_scc_self_loops_only(spark):
    edges = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert alg.strongly_connected_components(edges).count() == 0


def test_scc_long_chain_trims_fast(spark):
    # a 59-node directed chain is pure DAG: the trim phase must collapse
    # it without one-FW-BW-peel-per-node (ADVICE r3: >5 min pre-fix)
    import time

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 59)], "src long, dst long"
    )
    t0 = time.time()
    out = {r["id"]: r["component"]
           for r in alg.strongly_connected_components(edges, max_rounds=5).collect()}
    assert out == {i: i for i in range(1, 60)}
    assert time.time() - t0 < 120


def test_scc_chain_into_cycle(spark):
    # chain 1->2->3 feeding a cycle 3->4->5->3: trim peels the chain,
    # FW-BW finds the cycle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 3)], "src long, dst long"
    )
    out = {r["id"]: r["component"]
           for r in alg.strongly_connected_components(edges, max_rounds=10).collect()}
    assert out == {1: 1, 2: 2, 3: 3, 4: 3, 5: 3}


def test_scc_functional_matches_general(spark):
    # rho-shaped functional graph: f(p) = (p*p + 1) mod 20
    n = 20
    edges = spark.createDataFrame(
        [(p, (p * p + 1) % n) for p in range(n)], "src long, dst long"
    )
    fast = {r["id"]: r["component"] for r in alg.scc_functional(edges).collect()}
    slow = {r["id"]: r["component"]
            for r in alg.strongly_connected_components(edges).collect()}
    assert fast == slow and len(fast) == n


def test_landmark_distances_per_source(spark):
    # chain 1-2-3-4: each landmark keeps its OWN distances (bfs_distances
    # would merge them into min-dist)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    lms = spark.createDataFrame([(1,), (4,)], "id long")
    out = {(r["lm"], r["id"]): r["dist"]
           for r in alg.landmark_distances(edges, lms, undirected=True).collect()}
    assert out[(1, 4)] == 3 and out[(4, 1)] == 3
    assert out[(1, 2)] == 1 and out[(4, 3)] == 1
    assert out[(1, 1)] == 0 and out[(4, 4)] == 0


def test_harmonic_closeness_center_wins(spark):
    # star: the hub is closest to everyone
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    lms = spark.createDataFrame([(i,) for i in range(6)], "id long")
    h = {r["id"]: r["harmonic"]
         for r in alg.harmonic_closeness(edges, lms, undirected=True).collect()}
    assert h[0] == max(h.values()) == 5.0            # hub: five at dist 1
    assert abs(h[1] - (1.0 + 4 * 0.5)) < 1e-6        # spoke: hub 1, rest 2


def test_ego_network_induced_edges(spark):
    # path 1-2-3-4-5 plus chord (2,4): radius-1 ego of 3 must include the
    # chord (both endpoints are neighbors of 3) but not (1,2) or (4,5)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 4)], "src long, dst long"
    )
    centers = spark.createDataFrame([(3,)], "id long")
    got = {(r["src"], r["dst"])
           for r in alg.ego_network(edges, centers, radius=1).collect()}
    assert got == {(2, 3), (3, 4), (2, 4)}
    # radius 2 from node 1 reaches 3: includes (2,3) and the chord (2,4)?
    # node 4 is at dist 2 via the chord, so (2,4) and (3,4) join too
    got2 = {(r["src"], r["dst"])
            for r in alg.ego_network(edges, spark.createDataFrame([(1,)], "id long"),
                                     radius=2).collect()}
    assert (1, 2) in got2 and (2, 3) in got2 and (2, 4) in got2
    assert (4, 5) not in got2


def test_personalized_pagerank_localizes_mass(spark):
    # two triangles bridged by one edge: seeding in triangle A keeps most
    # mass in A; total mass stays 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    r = {row["id"]: row["rank"]
         for row in alg.personalized_pagerank(edges, seeds, iterations=20).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert sum(r[i] for i in [1, 2, 3]) > sum(r[i] for i in [10, 11, 12])
    assert r[1] == max(r.values())


def test_personalized_pagerank_dangling_returns_to_seeds(spark):
    # 1 -> 2, 2 is a sink: its mass teleports back to the seed, not
    # uniformly, so node 3 (isolated) gets rank 0
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    seeds = spark.createDataFrame([(1,)], "id long")
    r = {row["id"]: row["rank"]
         for row in alg.personalized_pagerank(
             edges, seeds, vertices=verts, iterations=30).collect()}
    assert r[3] == 0.0
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[1] > r[2] > 0


def _tarjan_scc(n_nodes, edges):
    """Iterative Tarjan over adjacency lists; returns {node: min-id of its
    SCC} for nodes appearing in edges (matching the operator's contract)."""
    adj = {}
    nodes = set()
    for s, d in edges:
        if s != d:
            adj.setdefault(s, []).append(d)
            nodes.add(s); nodes.add(d)
    index = {}; low = {}; on = set(); stack = []; out = {}; counter = [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, iter(adj.get(root, ())))]
        index[root] = low[root] = counter[0]; counter[0] += 1
        stack.append(root); on.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]; counter[0] += 1
                    stack.append(w); on.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop(); on.discard(w); comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
    return out


def test_scc_random_graphs_match_tarjan(spark):
    import random

    for seed, n, m in [(1, 8, 10), (2, 12, 18), (3, 15, 30), (4, 20, 24),
                       (5, 10, 40), (6, 18, 12)]:
        rng = random.Random(seed)
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        got = {r["id"]: r["component"]
               for r in alg.strongly_connected_components(df, max_rounds=30).collect()}
        want = _tarjan_scc(n, edges)
        assert got == want, f"seed {seed}: {got} != {want}"


# ---------------------------------------------------------------- betweenness


def _brandes_reference(n_nodes, edge_list, sources=None, undirected=False,
                       max_hops=None):
    """Pure-Python Brandes (BFS variant) for cross-checking."""
    from collections import defaultdict, deque

    # neighbor SETS: the engine dedups the edge frame, so (a,b)+(b,a) in an
    # undirected input is one edge, not two parallel ones
    adj_s = defaultdict(set)
    for s, d in edge_list:
        adj_s[s].add(d)
        if undirected:
            adj_s[d].add(s)
    adj = {k: sorted(v) for k, v in adj_s.items()}
    bet = defaultdict(float)
    for s in sources if sources is not None else range(n_nodes):
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if max_hops is not None and dist[v] >= max_hops:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bet[w] += delta[w]
    scale = 0.5 if undirected else 1.0
    return {v: round(b * scale, 6) for v, b in bet.items() if b * scale > 1e-12}


def _bet(spark, edge_list, n, **kw):
    from cypher_for_apache_spark_spark.operators.algorithms import betweenness

    e = spark.createDataFrame(edge_list, "src long, dst long")
    srcs = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = betweenness(e, srcs, **kw)
    return {r["id"]: r["betweenness"] for r in out.collect()}


def test_betweenness_diamond(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _bet(spark, edges, 4)
    assert got == {1: 0.5, 2: 0.5}


def test_betweenness_directed_chain(spark):
    # chain 0->1->2->3: b(1) = pairs (0,2),(0,3) = 2; b(2) = (0,3),(1,3) = 2
    got = _bet(spark, [(0, 1), (1, 2), (2, 3)], 4)
    assert got == {1: 2.0, 2: 2.0}


def test_betweenness_chain_with_hop_cap(spark):
    got = _bet(spark, [(0, 1), (1, 2), (2, 3)], 4, max_hops=2)
    exp = _brandes_reference(4, [(0, 1), (1, 2), (2, 3)], max_hops=2)
    assert got == exp


def test_betweenness_undirected_star(spark):
    # star center 0 with leaves 1..4: center lies on all C(4,2) leaf pairs
    edges = [(0, i) for i in range(1, 5)]
    got = _bet(spark, edges, 5, undirected=True)
    assert got == {0: 6.0}


def test_betweenness_random_graphs_match_brandes(spark):
    import random

    rng = random.Random(11)
    for trial in range(4):
        n = rng.randint(5, 9)
        m = rng.randint(n, 2 * n)
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        und = trial % 2 == 0
        got = _bet(spark, edges, n, undirected=und)
        exp = _brandes_reference(n, edges, undirected=und)
        assert got == exp, f"trial {trial}: {sorted(got.items())} != {sorted(exp.items())}"


def test_betweenness_sampled_sources_subset(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    from cypher_for_apache_spark_spark.operators.algorithms import betweenness

    e = spark.createDataFrame(edges, "src long, dst long")
    srcs = spark.createDataFrame([(0,), (1,)], "id long")
    got = {r["id"]: r["betweenness"] for r in betweenness(e, srcs).collect()}
    exp = _brandes_reference(5, edges, sources=[0, 1])
    assert got == exp


def test_betweenness_source_batches_equal_single_wave(spark):
    # delta sums over sources commute, so wave-split results must be
    # identical to the one-wave plan — on graphs with branching sigma
    import random

    rng = random.Random(31)
    for trial in range(3):
        n = rng.randint(6, 10)
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(2 * n)})
        edges = [(a, b) for a, b in edges if a != b]
        und = trial % 2 == 1
        one = _bet(spark, edges, n, undirected=und)
        for nb in (2, 3):
            batched = _bet(spark, edges, n, undirected=und, source_batches=nb)
            assert batched == one, f"trial {trial} nb={nb}"


def test_betweenness_source_batches_with_hop_cap(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (2, 4)]
    one = _bet(spark, edges, 5, max_hops=2)
    assert _bet(spark, edges, 5, max_hops=2, source_batches=4) == one
    assert one == _brandes_reference(5, edges, max_hops=2)
