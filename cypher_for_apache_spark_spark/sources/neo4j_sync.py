"""Neo4j graph-merge sink: push a PropertyGraph delta into a live Neo4j.

Parity target: the reference's merge feature
(morpheus-spark-cypher/.../api/io/neo4j/sync/Neo4jGraphMerge.scala:133-156,
okapi-neo4j-io/.../ElementWriter.scala:44-111):

- nodes merge per exact label combination by their NODE KEY properties
  (``MERGE (n:Labels { keys }) SET n.other = ...``); every merged node is
  stamped with the temporary meta property ``___morpheusID`` carrying the
  delta graph's node id,
- relationships merge per type by locating their endpoints through that
  meta property (``MATCH (from {___morpheusID: ..}) MATCH (to {..})
  MERGE (from)-[rel:TYPE { rel keys }]->(to) SET rel.prop = ...``),
- the meta property is removed afterwards,
- an optional META LABEL (``___<graphName>``) scopes the merge to a named
  sub-graph, and ``create_indexes`` issues the node-key constraints /
  indexes that make the MERGE lookups indexed (Neo4jGraphMerge.scala:79-120).

Properties present in the delta overwrite existing values; missing ones
are left untouched — Cypher MERGE+SET semantics, same as the reference.

Transport: the same injected ``run(cypher, **params) -> iterable[dict]``
seam as the reader (sources/neo4j.py) — the env ships no Bolt driver, so
tests drive the full merge path through an in-memory fake that interprets
exactly the Cypher this sink emits; the real driver's ``session.run``
satisfies the contract directly.

Scale design: rows stream to Bolt in ``UNWIND $batch`` chunks, and when a
``runner_factory`` is supplied the batches are written EXECUTOR-SIDE via
``df.foreachPartition`` with one partition-local session — the same shape
as the reference (Neo4jGraphMerge.scala:190/:219 ``foreachPartitionAsync``
with a session per partition), so the delta never serializes through the
driver. Without a factory (e.g. an in-memory fake transport that cannot
cross process boundaries) the sink falls back to a driver-side
``toLocalIterator`` loop. Schema commands (index creation) and the final
meta-property cleanup are single statements and always run driver-side
over ``run``, also like the reference. A 100 TB graph does not transit
Bolt (use the bulk-CSV sink for initial loads — sources/neo4j_bulk.py);
this sink exists for GB-range DELTAS against a live graph.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Set

from pyspark.sql import DataFrame

from cypher_for_apache_spark_spark.sources.neo4j import Runner

RunnerFactory = Callable[[], Runner]

META_PREFIX = "___"
# reference: Neo4jHelpers.Neo4jDefaults.metaPropertyKey (Neo4jHelpers.scala:61)
META_PROPERTY = f"{META_PREFIX}morpheusID"

NodeKeys = Dict[str, Set[str]]
RelKeys = Dict[str, Set[str]]


class Neo4jSchemaError(ValueError):
    """No node key covers a label combination (reference: SchemaException)."""


def _label_string(labels: Iterable[str]) -> str:
    return "".join(f":`{l}`" for l in sorted(labels))


def meta_label_for(graph_name: Optional[str]) -> Optional[str]:
    """Sub-graph meta label (reference: MetaLabelSupport.scala:45)."""
    return f"{META_PREFIX}{graph_name}" if graph_name else None


def create_indexes(
    run: Runner,
    node_keys: NodeKeys,
    graph_name: Optional[str] = None,
) -> List[str]:
    """Issue the node-key constraints / indexes that make the merge's
    MERGE/MATCH lookups indexed (Neo4jGraphMerge.createIndexes,
    Neo4jGraphMerge.scala:79-120). Whole-graph merges get NODE KEY
    constraints (enterprise feature) + a meta-property index per label;
    sub-graph merges can't use combo constraints (the meta label widens
    the combo), so they get plain composite indexes + a meta-label index.
    Returns the commands issued (callers/tests can assert them)."""
    issued: List[str] = []
    meta = meta_label_for(graph_name)
    if meta is None:
        for label, keys in sorted(node_keys.items()):
            props = ", ".join(f"n.`{k}`" for k in sorted(keys))
            issued.append(
                f"CREATE CONSTRAINT ON (n:`{label}`) ASSERT ({props}) IS NODE KEY"
            )
        for label in sorted(node_keys):
            issued.append(f"CREATE INDEX ON :`{label}`(`{META_PROPERTY}`)")
    else:
        for label, keys in sorted(node_keys.items()):
            props = ", ".join(f"`{k}`" for k in sorted(keys))
            issued.append(f"CREATE INDEX ON :`{label}`({props})")
        issued.append(f"CREATE INDEX ON :`{meta}`(`{META_PROPERTY}`)")
    for cmd in issued:
        list(run(cmd))
    return issued


def _node_key_for(combo: Sequence[str], node_keys: NodeKeys) -> Set[str]:
    """First label in the combo with a declared key (reference:
    MergeWriters.writeNodes, Neo4jGraphMerge.scala:183-185)."""
    for label in sorted(combo):
        if label in node_keys:
            return node_keys[label]
    raise Neo4jSchemaError(
        f"could not find a node key for label combination {sorted(combo)}"
    )


def _batched_rows(df: DataFrame, batch_size: int) -> Iterable[List[list]]:
    batch: List[list] = []
    for row in df.toLocalIterator():
        batch.append(list(row))
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def _partition_writer(cypher: str, batch_size: int, factory: RunnerFactory):
    """Per-partition write task (executor-side): build one runner for the
    partition, play its rows in UNWIND batches, close the runner. Empty
    partitions never open a connection. The returned closure captures only
    (str, int, factory), so it pickles to executors as long as the factory
    does — a real Bolt factory captures just uri/user/password strings
    (``bolt_runner_factory``)."""

    def write(rows: Iterable) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        runner = factory()
        try:
            batch = [list(first)]
            for row in it:
                batch.append(list(row))
                if len(batch) >= batch_size:
                    list(runner(cypher, batch=batch))
                    batch = []
            if batch:
                list(runner(cypher, batch=batch))
        finally:
            close = getattr(runner, "close", None)
            if close is not None:
                close()

    return write


def bolt_runner_factory(uri: str, user: str, password: str) -> RunnerFactory:
    """Serializable factory for executor-side Bolt sessions: captures only
    connection strings; the neo4j driver is imported inside the executor
    task (reference: Neo4jGraphMerge.scala:190 builds the session inside
    foreachPartitionAsync). The returned runner exposes ``close`` so
    ``_partition_writer`` tears the driver down per partition."""

    def factory() -> Runner:  # pragma: no cover - driver absent in env
        import neo4j

        driver = neo4j.GraphDatabase.driver(uri, auth=(user, password))

        def run(cypher: str, **params) -> Iterable[dict]:
            with driver.session() as session:
                return [r.data() for r in session.run(cypher, params)]

        run.close = driver.close
        return run

    return factory


def _write_df(
    df: DataFrame,
    cypher: str,
    run: Runner,
    batch_size: int,
    runner_factory: Optional[RunnerFactory],
) -> None:
    """Executor-side ``foreachPartition`` when a factory is available,
    driver-side toLocalIterator loop otherwise."""
    if runner_factory is not None:
        df.foreachPartition(_partition_writer(cypher, batch_size, runner_factory))
    else:
        for batch in _batched_rows(df, batch_size):
            list(run(cypher, batch=batch))


def _merge_nodes_cypher(
    columns: Sequence[str], labels: Iterable[str], keys: Set[str]
) -> str:
    """UNWIND-batch node merge (ElementWriter.mergeNodes,
    ElementWriter.scala:44-73). Column 0 is the delta node id, mapped to
    the meta property; key properties go into the MERGE pattern, the rest
    (meta id included) into SET."""
    mapping = [META_PROPERTY] + list(columns[1:])
    missing = keys - set(columns[1:])
    if missing:
        raise Neo4jSchemaError(
            f"node key properties {sorted(missing)} missing from node table "
            f"columns {list(columns)}"
        )
    key_props = ", ".join(
        f"`{k}`: row[{mapping.index(k)}]" for k in sorted(keys)
    )
    sets = "\n".join(
        f"SET n.`{k}` = row[{i}]"
        for i, k in enumerate(mapping)
        if k not in keys
    )
    return (
        f"UNWIND $batch AS row\n"
        f"MERGE (n{_label_string(labels)} {{ {key_props} }})\n{sets}"
    )


def _merge_rels_cypher(
    columns: Sequence[str],
    rel_type: str,
    keys: Set[str],
    meta: Optional[str],
) -> str:
    """UNWIND-batch relationship merge (ElementWriter.mergeRelationships,
    ElementWriter.scala:76-111). Columns are (id, src, dst, props...):
    the id is not written (Neo4j owns rel identity), endpoints resolve by
    meta property; key properties go into the MERGE pattern (empty set =
    merge any single rel of the type between the endpoints — Cypher MERGE
    semantics, same as the reference)."""
    props = list(columns[3:])
    missing = keys - set(props)
    if missing:
        raise Neo4jSchemaError(
            f"relationship key properties {sorted(missing)} missing from "
            f"table columns {list(columns)}"
        )
    key_props = ", ".join(f"`{k}`: row[{3 + props.index(k)}]" for k in sorted(keys))
    sets = "\n".join(
        f"SET rel.`{k}` = row[{3 + i}]"
        for i, k in enumerate(props)
        if k not in keys
    )
    ml = _label_string([meta]) if meta else ""
    return (
        f"UNWIND $batch AS row\n"
        f"MATCH (from{ml} {{`{META_PROPERTY}`: row[1]}})\n"
        f"MATCH (to{ml} {{`{META_PROPERTY}`: row[2]}})\n"
        f"MERGE (from)-[rel:`{rel_type}` {{ {key_props} }}]->(to)"
        + (f"\n{sets}" if sets else "")
    )


def merge_graph(
    graph,
    run: Runner,
    node_keys: NodeKeys,
    rel_keys: Optional[RelKeys] = None,
    graph_name: Optional[str] = None,
    batch_size: int = 1000,
    runner_factory: Optional[RunnerFactory] = None,
) -> None:
    """Merge ``graph`` (a PropertyGraph delta) into a live Neo4j database
    (Neo4jGraphMerge.merge, Neo4jGraphMerge.scala:133-156): nodes first
    (stamped with the meta id), then relationships (endpoints by meta id),
    then the meta property is removed. ``node_keys`` maps label ->
    identifying property set; ``rel_keys`` optionally maps type -> key set
    (unkeyed types merge at most one rel per endpoint pair).

    ``runner_factory`` distributes the UNWIND batch writes executor-side
    (one transport per partition, reference: Neo4jGraphMerge.scala:190/:219)
    — pass ``bolt_runner_factory(uri, user, password)`` for a real Neo4j.
    Node tables complete (a blocking action per table) before any
    relationship write starts, so endpoint meta-id lookups always see the
    merged nodes. Without a factory, batches fall back to a driver-side
    loop over ``run``."""
    rel_keys = rel_keys or {}
    meta = meta_label_for(graph_name)

    for combo, nt in sorted(graph.node_tables.items(), key=lambda kv: sorted(kv[0])):
        keys = _node_key_for(combo, node_keys)
        labels = set(combo) | ({meta} if meta else set())
        df = nt.df.select("id", *nt.property_columns)
        cypher = _merge_nodes_cypher(df.columns, labels, keys)
        _write_df(df, cypher, run, batch_size, runner_factory)

    for rel_type, tables in sorted(graph.rel_tables.items()):
        for rt in tables:
            props = rt.property_columns
            df = rt.df.select("id", "src", "dst", *props)
            cypher = _merge_rels_cypher(
                df.columns, rel_type, rel_keys.get(rel_type, set()), meta
            )
            _write_df(df, cypher, run, batch_size, runner_factory)

    ml = _label_string([meta]) if meta else ""
    list(run(f"MATCH (n{ml}) REMOVE n.`{META_PROPERTY}`"))
