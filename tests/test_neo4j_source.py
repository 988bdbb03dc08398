"""Neo4j PGDS read path driven end-to-end through an in-memory fake Bolt
transport (the env ships no driver; connect() raises cleanly — the runner
contract is the seam, exactly where the real neo4j session plugs in)."""

import re

import pytest

from cypher_for_apache_spark_spark.sources.neo4j import Neo4jGraphSource, connect


class FakeBolt:
    """Answers exactly the Cypher the source generates, over a tiny graph:

    (0:Person {name:'Alice', age:33})-[:KNOWS {since:2015}]->(1:Person {name:'Bob'})
    (1)-[:WORKS_AT {years:2.5}]->(2:Company:Org {title:'Acme'})
    """

    nodes = {
        0: (["Person"], {"name": "Alice", "age": 33}),
        1: (["Person"], {"name": "Bob"}),
        2: (["Company", "Org"], {"title": "Acme"}),
    }
    rels = {
        100: ("KNOWS", 0, 1, {"since": 2015}),
        101: ("WORKS_AT", 1, 2, {"years": 2.5}),
    }

    def __init__(self):
        self.queries = []

    def __call__(self, cypher, **params):
        self.queries.append(cypher)
        page = re.search(r"SKIP (\d+) LIMIT (\d+)$", cypher)
        body = cypher[: page.start()].strip() if page else cypher
        rows = self._answer(body, params)
        if page:
            skip, limit = int(page.group(1)), int(page.group(2))
            rows = rows[skip : skip + limit]
        return iter(rows)

    def _answer(self, q, params):
        if "DISTINCT labels(n)" in q:
            return [{"labels": ls} for ls, _ in self.nodes.values()]
        if "DISTINCT type(r)" in q:
            return [{"t": t} for t, *_ in self.rels.values()]
        if "UNWIND keys(n)" in q:
            combo = set(params["labels"])
            ks = set()
            for ls, props in self.nodes.values():
                if set(ls) == combo:
                    ks |= set(props)
            return [{"k": k} for k in sorted(ks)]
        if "UNWIND keys(r)" in q:
            t = re.search(r"\[r:(\w+)\]", q).group(1)
            ks = set()
            for rt, _s, _d, props in self.rels.values():
                if rt == t:
                    ks |= set(props)
            return [{"k": k} for k in sorted(ks)]
        if q.startswith("MATCH (n:"):
            combo = set(params["labels"])
            keys = sorted(
                re.findall(r"n\.(\w+) AS", q)
            )
            out = []
            for nid, (ls, props) in sorted(self.nodes.items()):
                if set(ls) == combo:
                    row = {"id": nid}
                    for k in keys:
                        row[k] = props.get(k)
                    out.append(row)
            return out
        if q.startswith("MATCH (a)-[r:"):
            t = re.search(r"\[r:(\w+)\]", q).group(1)
            keys = sorted(re.findall(r"r\.(\w+) AS", q))
            out = []
            for rid, (rt, s, d, props) in sorted(self.rels.items()):
                if rt == t:
                    row = {"id": rid, "src": s, "dst": d}
                    for k in keys:
                        row[k] = props.get(k)
                    out.append(row)
            return out
        raise AssertionError(f"unexpected cypher: {q}")


def test_schema_discovery(spark):
    src = Neo4jGraphSource(spark, FakeBolt())
    assert src.label_combos() == [("Company", "Org"), ("Person",)]
    assert src.rel_types() == ["KNOWS", "WORKS_AT"]


def test_graph_roundtrip_and_query(spark):
    src = Neo4jGraphSource(spark, FakeBolt())
    g = src.graph()
    from cypher_for_apache_spark_spark.session import CypherSession

    CypherSession(spark).store_graph("neo", g)
    out = g.cypher(
        "MATCH (a:Person)-[k:KNOWS]->(b:Person) "
        "RETURN a.name AS a, k.since AS since, b.name AS b"
    ).df.collect()
    assert [(r["a"], r["since"], r["b"]) for r in out] == [("Alice", 2015, "Bob")]
    two_label = g.cypher(
        "MATCH (c:Company:Org) RETURN c.title AS title"
    ).df.collect()
    assert [r["title"] for r in two_label] == ["Acme"]


def test_null_padding_within_combo(spark):
    # Bob has no 'age': the Person table still carries the column, null
    src = Neo4jGraphSource(spark, FakeBolt())
    df = src.read_nodes(("Person",))
    rows = {r["id"]: r for r in df.collect()}
    assert rows[0]["age"] == 33 and rows[1]["age"] is None
    assert dict(df.dtypes)["age"] == "bigint"


def test_paging_is_exhaustive(spark):
    fake = FakeBolt()
    src = Neo4jGraphSource(spark, fake, batch_size=1)  # force many pages
    df = src.read_nodes(("Person",))
    assert df.count() == 2
    # three page requests: row, row, empty tail
    assert sum("SKIP" in q for q in fake.queries) >= 3


def test_connect_without_driver_raises_cleanly():
    with pytest.raises(ImportError, match="neo4j"):
        connect("bolt://localhost:7687", "neo4j", "pw")
