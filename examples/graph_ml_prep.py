"""Graph-ML data preparation: communities, SCCs and a random-walk corpus.

Beyond the reference's surface — the training-data side of graph work:
detect communities (label propagation), find cyclic structure (SCC), and
emit a DeepWalk-style walk corpus for embedding training, all as
DataFrame iterations in the same session.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark.operators.algorithms import (
    label_propagation_edges,
    random_walks,
    scc_functional,
    strongly_connected_components,
)


def run(spark) -> None:
    # two triangles joined by one weak edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
        "src long, dst long",
    )

    # communities: the bridge does not merge the two triangles
    comms = {
        r["id"]: r["label"]
        for r in label_propagation_edges(edges, iterations=3).collect()
    }
    assert comms[1] == comms[2] == comms[3]
    assert comms[10] == comms[11] == comms[12]
    assert comms[1] != comms[10]

    # SCC on the DIRECTED view: each triangle is a cycle; the bridge is
    # one-way, so the components stay separate
    sccs = {
        r["id"]: r["component"]
        for r in strongly_connected_components(edges).collect()
    }
    assert sccs[1] == sccs[2] == sccs[3] == 1
    assert sccs[10] == sccs[11] == sccs[12] == 10

    # functional graphs (every node one out-edge) get the O(log n)
    # pointer-doubling path: f(p) = (p*p + 1) mod 12
    fedges = spark.createDataFrame(
        [(p, (p * p + 1) % 12) for p in range(12)], "src long, dst long"
    )
    fast = {r["id"]: r["component"] for r in scc_functional(fedges).collect()}
    slow = {
        r["id"]: r["component"]
        for r in strongly_connected_components(fedges).collect()
    }
    assert fast == slow

    # walk corpus: deterministic hash-seeded picks, exploded rows ready to
    # feed a skip-gram trainer (see operators/text.py:skipgram_pairs)
    adj = edges.unionByName(
        edges.selectExpr("dst as src", "src as dst")
    )
    starts = spark.createDataFrame([(1,), (10,)], "id long")
    walks = random_walks(adj, starts, walk_length=3, walks_per_node=2)
    rows = walks.collect()
    assert {r["start"] for r in rows} == {1, 10}
    # replay-stable: same inputs, same walks
    again = random_walks(adj, starts, walk_length=3, walks_per_node=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


if __name__ == "__main__":
    from _common import main

    main(run)
