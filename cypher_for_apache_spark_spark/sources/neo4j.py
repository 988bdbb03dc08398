"""Neo4j (Bolt) property-graph data source.

Parity target: the reference's Neo4j PGDS reads one node table per exact
label combination and one relationship table per type, via generated
Cypher over a Bolt connection, then assembles a property graph
(morpheus-spark-cypher/.../io/neo4j/Neo4jPropertyGraphDataSource.scala:62,
okapi-neo4j-io/.../ElementReader.scala flatExactLabelQuery).

This environment ships no Bolt driver, so the transport is INJECTED: any
object with ``run(cypher: str, **params) -> iterable[dict]`` works — the
real ``neo4j`` driver's ``session.run`` satisfies it directly (each record
exposes ``.data()``; adapt with ``lambda q, **p: (r.data() for r in
session.run(q, p))``). Tests drive the full read path through an
in-memory fake; ``connect()`` gates the real driver behind an import-try.

Scale design: Bolt is a row stream through the driver — the bottleneck is
the single connection, not Spark. Reads are batched (SKIP/LIMIT pages,
``batch_size`` rows per createDataFrame) so memory stays bounded; at real
volume, point several page readers at cluster replicas (the reference's
Neo4jRDD partitions the same way: one Cypher query per partition with
SKIP/LIMIT). A 100 TB graph does not transit Bolt — for that, export to
parquet and use sources/fs.py; this source exists for graph-DB-resident
datasets in the GB range, same as the reference's.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, types as T

Runner = Callable[..., Iterable[dict]]


def connect(uri: str, user: str, password: str) -> Runner:
    """Build a Runner over the real neo4j Bolt driver, if installed."""
    try:
        import neo4j  # noqa: F401
    except ImportError as ex:  # pragma: no cover - driver absent in env
        raise ImportError(
            "the 'neo4j' Bolt driver is not installed; pass a custom "
            "runner (any run(cypher, **params) -> iterable[dict]) instead"
        ) from ex
    driver = neo4j.GraphDatabase.driver(uri, auth=(user, password))

    def run(cypher: str, **params) -> Iterable[dict]:  # pragma: no cover
        with driver.session() as session:
            for record in session.run(cypher, params):
                yield record.data()

    return run


_PY_TO_SPARK = {
    bool: T.BooleanType(),
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
}


def _infer_type(values: List) -> T.DataType:
    for v in values:
        if v is not None:
            for py, st in _PY_TO_SPARK.items():
                if isinstance(v, py):
                    return st
            return T.StringType()
    return T.StringType()


class Neo4jGraphSource:
    """Reads a remote Neo4j graph into a PropertyGraph.

    Node tables are one per exact label combination and relationship
    tables one per type — the same table granularity the engine's scans
    expect (and the reference produces). Ids are Neo4j's element ids
    (longs), kept verbatim: node and relationship id spaces in Neo4j are
    independent, which matches the engine's per-table id contract.
    """

    def __init__(self, spark: SparkSession, run: Runner, batch_size: int = 10_000):
        self.spark = spark
        self.run = run
        self.batch_size = batch_size

    # -- schema discovery ------------------------------------------------
    def label_combos(self) -> List[Tuple[str, ...]]:
        rows = self.run(
            "MATCH (n) RETURN DISTINCT labels(n) AS labels"
        )
        combos = {tuple(sorted(r["labels"])) for r in rows}
        return sorted(c for c in combos if c)

    def rel_types(self) -> List[str]:
        rows = self.run("MATCH ()-[r]->() RETURN DISTINCT type(r) AS t")
        return sorted(r["t"] for r in rows)

    def _node_keys(self, combo: Sequence[str]) -> List[str]:
        rows = self.run(
            f"MATCH (n:{':'.join(combo)}) WHERE labels(n) = $labels "
            "UNWIND keys(n) AS k RETURN DISTINCT k",
            labels=list(combo),
        )
        return sorted(r["k"] for r in rows)

    def _rel_keys(self, rel_type: str) -> List[str]:
        rows = self.run(
            f"MATCH ()-[r:{rel_type}]->() UNWIND keys(r) AS k RETURN DISTINCT k"
        )
        return sorted(r["k"] for r in rows)

    # -- paged table reads -----------------------------------------------
    def _paged(self, cypher: str, **params) -> Iterable[dict]:
        skip = 0
        while True:
            page = list(
                self.run(
                    f"{cypher} SKIP {skip} LIMIT {self.batch_size}", **params
                )
            )
            yield from page
            if len(page) < self.batch_size:
                return
            skip += self.batch_size

    def _to_df(self, rows: List[dict], cols: List[str]) -> DataFrame:
        fields = [
            T.StructField(c, T.LongType() if c in ("id", "src", "dst") else
                          _infer_type([r.get(c) for r in rows]), True)
            for c in cols
        ]
        schema = T.StructType(fields)
        data = [tuple(r.get(c) for c in cols) for r in rows]
        return self.spark.createDataFrame(data, schema)

    def read_nodes(self, combo: Sequence[str]) -> DataFrame:
        """Exact-label-combo node table: (id, props...). Mirrors the
        reference's flatExactLabelQuery — nodes carrying extra labels
        belong to a different combo table."""
        keys = self._node_keys(combo)
        props = "".join(f", n.{k} AS {k}" for k in keys)
        cypher = (
            f"MATCH (n:{':'.join(combo)}) WHERE labels(n) = $labels "
            f"RETURN id(n) AS id{props} ORDER BY id"
        )
        rows = list(self._paged(cypher, labels=list(combo)))
        return self._to_df(rows, ["id"] + keys)

    def read_rels(self, rel_type: str) -> DataFrame:
        keys = self._rel_keys(rel_type)
        props = "".join(f", r.{k} AS {k}" for k in keys)
        cypher = (
            f"MATCH (a)-[r:{rel_type}]->(b) "
            f"RETURN id(r) AS id, id(a) AS src, id(b) AS dst{props} "
            "ORDER BY id"
        )
        rows = list(self._paged(cypher))
        return self._to_df(rows, ["id", "src", "dst"] + keys)

    def graph(self):
        """Assemble the full remote graph as a PropertyGraph."""
        from cypher_for_apache_spark_spark.graph import (
            NodeTable,
            PropertyGraph,
            RelationshipTable,
        )

        nodes = [
            NodeTable.create(list(combo), self.read_nodes(combo))
            for combo in self.label_combos()
        ]
        rels = [
            RelationshipTable.create(t, self.read_rels(t))
            for t in self.rel_types()
        ]
        return PropertyGraph(nodes, rels)
