"""Neo4j graph-merge sink driven end-to-end through an in-memory fake
Neo4j that interprets exactly the Cypher the sink emits (UNWIND+MERGE
node batches, endpoint-matched rel merges, meta-property cleanup) —
the same injected-transport seam as the reader. Round-trip: seed fake ->
merge delta -> re-read with Neo4jGraphSource -> assert merged state."""

import re

import pytest

from cypher_for_apache_spark_spark.sources import neo4j_sync as sync
from cypher_for_apache_spark_spark.sources.neo4j import Neo4jGraphSource


class FakeNeo4j:
    """Tiny property-graph store speaking both the reader's and the merge
    sink's Cypher. Node identity inside the store is an internal counter;
    MERGE semantics follow Cypher: match on the pattern's key properties
    (+ all pattern labels), else create."""

    def __init__(self):
        self.nodes = {}  # nid -> (set(labels), dict(props))
        self.rels = {}  # rid -> (type, src, dst, dict(props))
        self._next = 0
        self.queries = []

    def _new_id(self):
        self._next += 1
        return self._next - 1

    # -- transport seam ---------------------------------------------------
    def __call__(self, cypher, **params):
        self.queries.append(cypher)
        q = cypher.strip()
        if q.startswith("CREATE CONSTRAINT") or q.startswith("CREATE INDEX"):
            return iter([])
        if q.startswith("UNWIND $batch AS row"):
            self._apply_batch(q, params["batch"])
            return iter([])
        if re.match(r"MATCH \(n(:`[^`]+`)?\) REMOVE n\.`?___morpheusID`?", q):
            label = re.match(r"MATCH \(n:`([^`]+)`\)", q)
            for labels, props in self.nodes.values():
                if label is None or label.group(1) in labels:
                    props.pop(sync.META_PROPERTY, None)
            return iter([])
        return self._read(q, params)

    # -- merge interpreter ------------------------------------------------
    def _apply_batch(self, q, batch):
        lines = q.split("\n")
        if lines[1].startswith("MERGE (n"):
            labels = set(re.findall(r":`([^`]+)`", lines[1]))
            key_map = {
                k: int(i)
                for k, i in re.findall(r"`([^`]+)`: row\[(\d+)\]", lines[1])
            }
            set_map = {
                k: int(i)
                for k, i in re.findall(r"SET n\.`([^`]+)` = row\[(\d+)\]", q)
            }
            for row in batch:
                keyvals = {k: row[i] for k, i in key_map.items()}
                nid = next(
                    (
                        n
                        for n, (ls, ps) in self.nodes.items()
                        if labels <= ls
                        and all(ps.get(k) == v for k, v in keyvals.items())
                    ),
                    None,
                )
                if nid is None:
                    nid = self._new_id()
                    self.nodes[nid] = (set(labels), dict(keyvals))
                else:
                    self.nodes[nid][0].update(labels)
                for k, i in set_map.items():
                    self.nodes[nid][1][k] = row[i]
        else:  # relationship merge
            mfrom = re.search(r"MATCH \(from[^{]*\{`([^`]+)`: row\[(\d+)\]", q)
            mto = re.search(r"MATCH \(to[^{]*\{`([^`]+)`: row\[(\d+)\]", q)
            mrel = re.search(r"MERGE \(from\)-\[rel:`([^`]+)` \{ ?([^}]*)\}\]", q)
            rel_type = mrel.group(1)
            key_map = {
                k: int(i)
                for k, i in re.findall(r"`([^`]+)`: row\[(\d+)\]", mrel.group(2))
            }
            set_map = {
                k: int(i)
                for k, i in re.findall(r"SET rel\.`([^`]+)` = row\[(\d+)\]", q)
            }

            def by_meta(val):
                hits = [
                    n
                    for n, (_ls, ps) in self.nodes.items()
                    if ps.get(mfrom.group(1)) == val
                ]
                assert len(hits) == 1, f"meta id {val} matched {hits}"
                return hits[0]

            for row in batch:
                s, d = by_meta(row[int(mfrom.group(2))]), by_meta(row[int(mto.group(2))])
                keyvals = {k: row[i] for k, i in key_map.items()}
                rid = next(
                    (
                        r
                        for r, (t, rs, rd, ps) in self.rels.items()
                        if t == rel_type
                        and (rs, rd) == (s, d)
                        and all(ps.get(k) == v for k, v in keyvals.items())
                    ),
                    None,
                )
                if rid is None:
                    rid = self._new_id()
                    self.rels[rid] = (rel_type, s, d, dict(keyvals))
                for k, i in set_map.items():
                    self.rels[rid][3][k] = row[i]

    # -- reader protocol (subset of tests/test_neo4j_source.py fake) ------
    def _read(self, q, params):
        if "DISTINCT labels(n)" in q:
            return iter([{"labels": sorted(ls)} for ls, _ in self.nodes.values()])
        if "DISTINCT type(r)" in q:
            return iter(
                [{"t": t} for t in sorted({t for t, *_ in self.rels.values()})]
            )
        if "UNWIND keys(n)" in q:
            combo = set(params["labels"])
            ks = set()
            for ls, props in self.nodes.values():
                if ls == combo:
                    ks |= set(props)
            return iter([{"k": k} for k in sorted(ks)])
        if "UNWIND keys(r)" in q:
            t = re.search(r"\[r:(\w+)\]", q).group(1)
            ks = set()
            for rt, _s, _d, props in self.rels.values():
                if rt == t:
                    ks |= set(props)
            return iter([{"k": k} for k in sorted(ks)])
        page = re.search(r"SKIP (\d+) LIMIT (\d+)$", q)
        body = q[: page.start()].strip() if page else q
        if body.startswith("MATCH (n:"):
            combo = set(params["labels"])
            keys = sorted(re.findall(r"n\.(\w+) AS", body))
            rows = [
                {"id": nid, **{k: props.get(k) for k in keys}}
                for nid, (ls, props) in sorted(self.nodes.items())
                if ls == combo
            ]
        else:
            t = re.search(r"\[r:(\w+)\]", body).group(1)
            keys = sorted(re.findall(r"r\.(\w+) AS", body))
            rows = [
                {"id": rid, "src": s, "dst": d, **{k: p.get(k) for k in keys}}
                for rid, (rt, s, d, p) in sorted(self.rels.items())
                if rt == t
            ]
        if page:
            skip, limit = int(page.group(1)), int(page.group(2))
            rows = rows[skip : skip + limit]
        return iter(rows)


@pytest.fixture
def delta_graph(spark):
    from cypher_for_apache_spark_spark.graph import (
        NodeTable,
        PropertyGraph,
        RelationshipTable,
    )

    people = spark.createDataFrame(
        [(0, "alice", 34), (1, "bob", 28), (2, "carol", 51)],
        "id long, name string, age long",
    )
    knows = spark.createDataFrame(
        [(0, 0, 1, 2019), (1, 1, 2, 2021)], "id long, src long, dst long, since long"
    )
    return PropertyGraph(
        [NodeTable.create(["Person"], people)],
        [RelationshipTable.create("KNOWS", knows)],
    )


def test_merge_into_empty_then_roundtrip(spark, delta_graph):
    fake = FakeNeo4j()
    sync.merge_graph(delta_graph, fake, node_keys={"Person": {"name"}})
    # meta property cleaned up
    assert all(
        sync.META_PROPERTY not in props for _ls, props in fake.nodes.values()
    )
    g = Neo4jGraphSource(spark, fake).graph()
    rows = g.cypher(
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) "
        "RETURN a.name AS a, r.since AS since, b.name AS b ORDER BY since"
    ).to_maps()
    assert rows == [
        {"a": "alice", "since": 2019, "b": "bob"},
        {"a": "bob", "since": 2021, "b": "carol"},
    ]


def test_merge_is_idempotent_and_updates(spark, delta_graph):
    fake = FakeNeo4j()
    sync.merge_graph(delta_graph, fake, node_keys={"Person": {"name"}})
    n_nodes, n_rels = len(fake.nodes), len(fake.rels)
    # second merge with an updated property: no new elements, value updated
    from cypher_for_apache_spark_spark.graph import (
        NodeTable,
        PropertyGraph,
        RelationshipTable,
    )

    people2 = spark.createDataFrame(
        [(0, "alice", 35)], "id long, name string, age long"
    )
    knows2 = spark.createDataFrame(
        [(0, 0, 0, 2019)], "id long, src long, dst long, since long"
    )
    # src==dst==0 -> alice; rel endpoints change, so this merges a NEW rel
    delta2 = PropertyGraph(
        [NodeTable.create(["Person"], people2)],
        [RelationshipTable.create("KNOWS", knows2)],
    )
    sync.merge_graph(delta2, fake, node_keys={"Person": {"name"}})
    assert len(fake.nodes) == n_nodes  # alice matched, not duplicated
    alice = next(p for _ls, p in fake.nodes.values() if p.get("name") == "alice")
    assert alice["age"] == 35  # property overwritten
    assert len(fake.rels) == n_rels + 1  # self-loop rel is new


def test_merge_preserves_existing_untouched_props(spark, delta_graph):
    fake = FakeNeo4j()
    # pre-existing alice with an extra property the delta doesn't carry
    fake.nodes[fake._new_id()] = ({"Person"}, {"name": "alice", "city": "berlin"})
    sync.merge_graph(delta_graph, fake, node_keys={"Person": {"name"}})
    alice = next(p for _ls, p in fake.nodes.values() if p.get("name") == "alice")
    assert alice["city"] == "berlin"  # untouched
    assert alice["age"] == 34  # added from the delta
    assert sum(p.get("name") == "alice" for _l, p in fake.nodes.values()) == 1


def test_rel_keys_dedupe_on_key(spark):
    from cypher_for_apache_spark_spark.graph import (
        NodeTable,
        PropertyGraph,
        RelationshipTable,
    )

    people = spark.createDataFrame([(0, "a"), (1, "b")], "id long, name string")
    rated = spark.createDataFrame(
        [(0, 0, 1, 2020, 5), (1, 0, 1, 2021, 3)],
        "id long, src long, dst long, year long, stars long",
    )
    g = PropertyGraph(
        [NodeTable.create(["Person"], people)],
        [RelationshipTable.create("RATED", rated)],
    )
    fake = FakeNeo4j()
    sync.merge_graph(
        g, fake, node_keys={"Person": {"name"}}, rel_keys={"RATED": {"year"}}
    )
    assert len(fake.rels) == 2  # keyed by year -> both survive
    # re-merging the 2021 rating with new stars updates in place
    rated2 = rated.where("year = 2021").withColumn("stars", rated.stars * 0 + 4)
    g2 = PropertyGraph(
        [NodeTable.create(["Person"], people)],
        [RelationshipTable.create("RATED", rated2)],
    )
    sync.merge_graph(
        g2, fake, node_keys={"Person": {"name"}}, rel_keys={"RATED": {"year"}}
    )
    assert len(fake.rels) == 2
    y2021 = next(p for t, _s, _d, p in fake.rels.values() if p.get("year") == 2021)
    assert y2021["stars"] == 4


def test_sub_graph_meta_label_scoping(spark, delta_graph):
    fake = FakeNeo4j()
    sync.merge_graph(
        delta_graph, fake, node_keys={"Person": {"name"}}, graph_name="social"
    )
    # merged nodes carry the sub-graph meta label
    assert all("___social" in ls for ls, _p in fake.nodes.values())
    assert all(
        sync.META_PROPERTY not in p for _ls, p in fake.nodes.values()
    )


def test_missing_node_key_raises(spark, delta_graph):
    with pytest.raises(sync.Neo4jSchemaError):
        sync.merge_graph(delta_graph, FakeNeo4j(), node_keys={"Company": {"name"}})


def test_create_indexes_commands():
    fake = FakeNeo4j()
    cmds = sync.create_indexes(fake, {"Person": {"name", "dob"}})
    assert cmds == [
        "CREATE CONSTRAINT ON (n:`Person`) ASSERT (n.`dob`, n.`name`) IS NODE KEY",
        "CREATE INDEX ON :`Person`(`___morpheusID`)",
    ]
    cmds = sync.create_indexes(fake, {"Person": {"name"}}, graph_name="social")
    assert cmds == [
        "CREATE INDEX ON :`Person`(`name`)",
        "CREATE INDEX ON :`___social`(`___morpheusID`)",
    ]


def make_journal_factory(journal_dir):
    """Serializable executor-side transport for tests: each partition's
    runner appends its (cypher, batch) calls to a distinct journal file —
    executors share the local filesystem, so the driver can replay the
    journal afterwards to verify semantics AND count per-partition runner
    instantiations. A closure (not a test-module class) so cloudpickle
    ships it by value — workers don't import the test module."""

    def factory():
        import json
        import os
        import uuid

        path = os.path.join(
            journal_dir, f"journal-{os.getpid()}-{uuid.uuid4().hex}.jsonl"
        )
        f = open(path, "a")

        def run(cypher, **params):
            f.write(json.dumps({"cypher": cypher, "params": params}) + "\n")
            f.flush()
            return iter([])

        run.close = f.close
        return run

    return factory


def _replay_journal(journal_dir, fake):
    """Replay journaled batches into the in-memory fake: node merges first,
    then rel merges — the same phase ordering merge_graph guarantees (each
    node table's foreachPartition is a blocking action that completes
    before any rel write starts); within a phase order is irrelevant
    (MERGE is idempotent per key)."""
    import glob as g
    import json

    entries = []
    for path in sorted(g.glob(f"{journal_dir}/journal-*.jsonl")):
        with open(path) as f:
            entries.extend(json.loads(line) for line in f)
    is_rel = lambda e: "MATCH (from" in e["cypher"]
    for e in [e for e in entries if not is_rel(e)] + [e for e in entries if is_rel(e)]:
        list(fake(e["cypher"], **e["params"]))
    return entries


def test_distributed_merge_writes_executor_side(spark, delta_graph, tmp_path, monkeypatch):
    """With a runner_factory the delta must NOT serialize through the
    driver: the driver-side iterator path is never touched, the driver
    transport sees only the single-statement cleanup, and every batch
    arrives via a partition-local runner."""
    journal_dir = str(tmp_path)

    def _driver_path_forbidden(df, batch_size):
        raise AssertionError("driver-side toLocalIterator path used")

    monkeypatch.setattr(sync, "_batched_rows", _driver_path_forbidden)
    fake = FakeNeo4j()
    sync.merge_graph(
        delta_graph,
        fake,
        node_keys={"Person": {"name"}},
        runner_factory=make_journal_factory(journal_dir),
    )
    # driver transport: cleanup only, no UNWIND batch ever
    assert all("UNWIND" not in q for q in fake.queries)
    assert any("REMOVE n." in q for q in fake.queries)
    # replay the executor-side journal into a fresh store, then the
    # cleanup — the order a real Neo4j experiences (all batch writes
    # complete before merge_graph issues the driver-side cleanup)
    replayed = FakeNeo4j()
    entries = _replay_journal(journal_dir, replayed)
    list(replayed(f"MATCH (n) REMOVE n.`{sync.META_PROPERTY}`"))
    fake = replayed
    assert entries, "no executor-side writes journaled"
    assert all("UNWIND $batch AS row" in e["cypher"] for e in entries)
    # one journal file per (partition, table-write) with rows — a runner was
    # built per partition, not shared through the driver
    import glob as g

    n_files = len(g.glob(f"{journal_dir}/journal-*.jsonl"))
    assert n_files >= 2  # at least node table + rel table partitions
    # replayed state round-trips identically to the driver-path merge
    monkeypatch.undo()  # the reference merge below legitimately uses the driver path
    ref = FakeNeo4j()
    sync.merge_graph(delta_graph, ref, node_keys={"Person": {"name"}})
    canon = lambda f: (
        sorted((sorted(ls), sorted(ps.items())) for ls, ps in f.nodes.values()),
        sorted(
            (t, sorted(f.nodes[s][1].items()), sorted(f.nodes[d][1].items()), sorted(ps.items()))
            for t, s, d, ps in f.rels.values()
        ),
    )
    assert canon(fake) == canon(ref)


def test_distributed_merge_respects_batch_size(spark, delta_graph, tmp_path):
    journal_dir = str(tmp_path)
    fake = FakeNeo4j()
    sync.merge_graph(
        delta_graph,
        fake,
        node_keys={"Person": {"name"}},
        batch_size=1,
        runner_factory=make_journal_factory(journal_dir),
    )
    entries = _replay_journal(journal_dir, FakeNeo4j())
    assert all(len(e["params"]["batch"]) == 1 for e in entries)
    assert sum(len(e["params"]["batch"]) for e in entries) == 5  # 3 nodes + 2 rels
