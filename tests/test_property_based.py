"""Property-based tests (hypothesis): operators vs brute-force references.

Each property pits a distributed operator against an obviously-correct
single-machine implementation on randomized inputs — the reference's
acceptance-test discipline, but with generated cases instead of fixtures.
Deadlines are disabled because Spark job latency is unrelated to the
property under test; example counts are kept small since every example
runs Spark jobs.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

WORDS = ["spark", "query", "table", "join", "scan", "agg", "row", "key"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


def _ngrams(text: str, n: int) -> set:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@SET
@given(texts=doc_strategy)
def test_ngram_jaccard_matches_bruteforce(spark, texts):
    from cypher_for_apache_spark_spark.operators.dedup import ngram_jaccard_pairs

    n, t = 2, 0.5
    df = spark.createDataFrame(
        [Row(doc_id=i, text=s) for i, s in enumerate(texts)]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=n, threshold=t).collect()
    }
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = _ngrams(texts[a], n), _ngrams(texts[b], n)
            if not sa and not sb:
                continue
            union = len(sa | sb)
            if union == 0:
                continue
            j = len(sa & sb) / union
            if j >= t:
                want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


@SET
@given(texts=doc_strategy)
def test_exact_dedup_keeps_min_id_per_normalized_text(spark, texts):
    from cypher_for_apache_spark_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([Row(doc_id=i, text=s) for i, s in enumerate(texts)])
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    seen = {}
    for i, s in enumerate(texts):
        key = " ".join(s.lower().split())
        seen.setdefault(key, i)
    assert kept == sorted(seen.values())


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_vs_union_find(spark, edges):
    from cypher_for_apache_spark_spark.operators import algorithms as alg
    from cypher_for_apache_spark_spark.sources import edgelist

    g = edgelist.from_edge_df(spark.createDataFrame(edges, "src long, dst long"))
    got = {r["id"]: r["component"] for r in alg.connected_components(g).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    want = {x: find(x) for x in parent}
    # same partition into components AND the canonical min-id labeling
    assert {x: find(x) for x in got} == {x: want[x] for x in got}
    assert got == want


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=18,
    ),
    source=st.integers(0, 12),
)
def test_bfs_vs_dijkstra_unit_weights(spark, edges, source):
    from cypher_for_apache_spark_spark.operators import algorithms as alg
    from cypher_for_apache_spark_spark.sources import edgelist

    g = edgelist.from_edge_df(spark.createDataFrame(edges, "src long, dst long"))
    got = {r["id"]: r["dist"] for r in alg.bfs_distances(g, [source]).collect()}

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    want, frontier, d = {source: 0}, {source}, 0
    while frontier:
        d += 1
        frontier = {
            n for f in frontier for n in adj.get(f, ()) if n not in want
        }
        for n in frontier:
            want[n] = d
    assert got == want


@SET
@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=50, unique=True))
def test_hash_split_total_and_deterministic(spark, ids):
    from cypher_for_apache_spark_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    out = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", w).collect()}
    assert set(out) == set(ids)  # partition: every row exactly once
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(3), "doc_id", w).collect()
    }
    assert out == again


@SET
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4
        ),
        min_size=2,
        max_size=12,
    )
)
def test_knn_brute_matches_numpy(spark, vecs):
    import numpy as np

    from cypher_for_apache_spark_spark.operators.similarity import knn_brute

    q = [1.0, 0.5, -0.5, 0.25]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )
    got = [(r["vec_id"], r["sim"]) for r in knn_brute(df, q, k=3).collect()]

    qn = np.asarray(q)
    sims = []
    for i, v in enumerate(vecs):
        a = np.asarray(v, dtype=np.float64)
        denom = float(np.linalg.norm(a) * np.linalg.norm(qn))
        if denom == 0:
            continue  # cosine() yields null -> sorted last, dropped by top-k
        sims.append((round(float(a @ qn) / denom, 6), i))
    want = [
        (i, s) for s, i in sorted(sims, key=lambda t: (-t[0], t[1]))[:3]
    ]
    got_non_null = [(i, s) for i, s in got if s is not None]
    assert got_non_null == [
        (i, pytest.approx(s, abs=1e-9)) for i, s in want
    ][: len(got_non_null)] or got_non_null == want
