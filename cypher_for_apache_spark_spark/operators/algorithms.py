"""Graph algorithms over PropertyGraph, DataFrame-native.

The reference integrates GraphX for this (morpheus-examples/
GraphXPageRankExample.scala, RDD-based); these implementations stay in the
DataFrame/Catalyst world instead: iterative equi-joins + aggregations with
``localCheckpoint`` every iteration to truncate lineage (the classic
iterative-DataFrame failure mode is exponential plan growth, not data
volume). All shuffles key on long node ids; AQE handles skewed hubs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from cypher_for_apache_spark_spark.graph import PropertyGraph


def _edges(graph: PropertyGraph, rel_types=(), undirected: bool = False) -> DataFrame:
    e = graph.scan_rels(rel_types, out_id="_eid", out_src="src", out_dst="dst")
    if e is None:
        raise ValueError("graph has no relationship tables")
    e = e.select("src", "dst")
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e


def _vertices(graph: PropertyGraph) -> DataFrame:
    v = graph.scan_nodes(out_id="id", out_labels="_labels")
    return v.select("id")


def pagerank(
    graph: PropertyGraph,
    iterations: int = 10,
    damping: float = 0.85,
    rel_types=(),
) -> DataFrame:
    """(id, rank) after ``iterations`` synchronous PageRank steps.

    Dangling nodes' mass is redistributed uniformly each step, so ranks sum
    to |V| throughout (matching the classic formulation).
    """
    v = _vertices(graph).persist()
    n = v.count()
    e = _edges(graph, rel_types).persist()
    out_deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    links = e.join(out_deg, "src").persist()

    sinks = v.join(out_deg, v.id == out_deg.src, "left_anti").select("id")

    ranks = v.select("id", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("received"))
        )
        # dangling (sink) mass as a broadcast 1-row frame — no driver action
        dangling = (
            ranks.join(sinks, "id", "left_semi")
            .agg((F.coalesce(F.sum("rank"), F.lit(0.0)) / F.lit(float(n))).alias("_dangling"))
        )
        ranks = (
            v.join(contribs, "id", "left_outer")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("received"), F.lit(0.0)) + F.col("_dangling"))
                ).alias("rank"),
            )
            .localCheckpoint()  # truncate lineage per iteration
        )
    links.unpersist()
    v.unpersist()
    e.unpersist()
    return ranks


def connected_components(
    graph: PropertyGraph,
    max_iterations: int = 20,
    rel_types=(),
) -> DataFrame:
    """(id, component) via min-id label propagation with pointer doubling
    (undirected): each round takes the min over neighbours' labels, then
    jumps to the label's own label — convergence in O(log diameter) rounds
    instead of O(diameter). Each round is one checkpointed job plus a
    cheap short-circuit convergence probe."""
    e = _edges(graph, rel_types, undirected=True).persist()
    all_v = _vertices(graph)
    # isolated vertices never move — iterate over edge-incident ones only
    # and pad the rest with component = own id at the end
    incident = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .persist()
    )
    cc = incident.select("id", F.col("id").alias("component"))
    for _ in range(max_iterations):
        neighbor_min = (
            e.join(cc, e.src == cc.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("_nmin"))
        )
        stepped = cc.join(neighbor_min, "id", "left_outer").select(
            "id",
            F.col("component").alias("_orig"),
            F.least(
                F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
            ).alias("component"),
        )
        # pointer doubling: component <- component(component); one
        # checkpointed job per round, with the changed flag inline so the
        # convergence probe just reads the checkpoint
        jump = stepped.select(
            F.col("id").alias("_jid"), F.col("component").alias("_jcomp")
        )
        doubled = (
            stepped.join(jump, stepped.component == jump._jid, "left_outer")
            .select(
                "id",
                F.coalesce(F.col("_jcomp"), F.col("component")).alias("component"),
                (
                    F.coalesce(F.col("_jcomp"), F.col("component")) != F.col("_orig")
                ).alias("_changed"),
            )
            .localCheckpoint()
        )
        cc = doubled.select("id", "component")
        if doubled.filter(F.col("_changed")).limit(1).count() == 0:
            break
    isolated = all_v.join(incident, "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    out = cc.unionByName(isolated)
    e.unpersist()
    incident.unpersist()
    return out


def triangle_count(graph: PropertyGraph, rel_types=()) -> DataFrame:
    """Global triangle count (undirected, ignoring parallel edges).

    Canonical-ordering join: each triangle {a<b<c} is counted exactly once
    via edges (a,b),(b,c),(a,c)."""
    e = (
        _edges(graph, rel_types, undirected=True)
        .filter(F.col("src") < F.col("dst"))
        .dropDuplicates()
        .persist()
    )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    out = tri.agg(F.count("*").alias("triangles"))
    return out


def degrees(graph: PropertyGraph, rel_types=()) -> DataFrame:
    """(id, out_degree, in_degree, degree) for every node."""
    e = _edges(graph, rel_types)
    out_d = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_degree"))
    in_d = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))
    v = _vertices(graph)
    return (
        v.join(out_d, "id", "left_outer")
        .join(in_d, "id", "left_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))).alias(
                "degree"
            ),
        )
    )
