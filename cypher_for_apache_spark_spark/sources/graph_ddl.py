"""Graph DDL: the declarative text language mapping SQL tables/views to a
property graph.

Re-implements the reference's graph-ddl module (GraphDdlParser.scala,
GraphDdl.scala, documented in
documentation/asciidoc/backend-sql-graphddl.adoc) as a small hand-rolled
tokenizer + recursive-descent parser producing Spark DataFrame element
tables. Statements:

    SET SCHEMA <database>.<schema>
    CREATE ELEMENT TYPE <Name> ( prop STRING, data INTEGER?, ... )
    CREATE GRAPH TYPE <name> ( <element/node/rel type definitions> )
    CREATE GRAPH <name> [OF <graph type>] ( <definitions + table mappings> )

with node mappings ``(Person) FROM view_person (col AS prop, ...)`` (several
FROM clauses union), and relationship mappings

    (Person)-[ACTED_IN]->(Movie) FROM view_appearances rel
      START NODES (Person) FROM view_person p JOIN ON p.id = rel.person_id
      END NODES   (Movie)  FROM view_movie  m JOIN ON m.id = rel.movie_id

Identity semantics follow the reference's HashedId strategy
(SqlPropertyGraphDataSource.scala:348-368): an element id is a 64-bit hash
of (element type tag, view name, key columns), where a node view's key
columns are the node-side JOIN columns referencing it (all mappings must
agree), so relationship endpoints hash to exactly the node ids. A node view
never referenced by a relationship keys on all of its mapped property
columns (deterministic, unlike the reference's monotonically-increasing
fallback). Relationship endpoint label hints are set from the DDL types, so
schema-aware scan pruning and triplet coverage work out of the box.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from cypher_for_apache_spark_spark.graph import (
    NodeTable,
    PropertyGraph,
    RelationshipTable,
)


class GraphDdlError(ValueError):
    """Malformed DDL text or an inconsistent mapping."""


_TYPES = {
    "STRING": "string",
    "INTEGER": "long",
    "FLOAT": "double",
    "BOOLEAN": "boolean",
    "DATE": "date",
}

_TOKEN = re.compile(
    r"""--[^\n]*            # SQL comment
      | `[^`]*`             # backtick-quoted identifier
      | [A-Za-z_][\w$]*     # identifier / keyword
      | \]->                # rel arrow close
      | -\[                 # rel arrow open
      | [().,=?]            # punctuation
      | \S                  # anything else -> error token
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> List[str]:
    out = []
    for m in _TOKEN.finditer(text):
        t = m.group(0)
        if t.startswith("--"):
            continue
        out.append(t)
    return out


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

@dataclass
class ElementType:
    name: str
    # {property -> (spark type string, nullable)}
    props: Dict[str, Tuple[str, bool]] = field(default_factory=dict)


@dataclass
class NodeMappingDef:
    labels: Tuple[str, ...]
    views: List[Tuple[str, Dict[str, str]]] = field(default_factory=list)
    # views: [(view name, {property -> source column})]


@dataclass
class EndpointDef:
    labels: Tuple[str, ...]
    view: str
    alias: str
    # [(node-side column, edge-side column)]
    join: List[Tuple[str, str]] = field(default_factory=list)


@dataclass
class RelMappingDef:
    src_labels: Tuple[str, ...]
    rel_type: str
    dst_labels: Tuple[str, ...]
    views: List[Tuple[str, str, Dict[str, str], EndpointDef, EndpointDef]] = field(
        default_factory=list
    )
    # views: [(view, alias, {prop -> col}, start, end)]


@dataclass
class GraphDef:
    name: str
    of_type: Optional[str] = None
    element_types: Dict[str, ElementType] = field(default_factory=dict)
    nodes: List[NodeMappingDef] = field(default_factory=list)
    rels: List[RelMappingDef] = field(default_factory=list)


@dataclass
class DdlDocument:
    set_schema: Optional[str] = None
    element_types: Dict[str, ElementType] = field(default_factory=dict)
    graph_types: Dict[str, GraphDef] = field(default_factory=dict)
    graphs: Dict[str, GraphDef] = field(default_factory=dict)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: List[str]):
        self.toks = tokens
        self.i = 0

    def peek(self, ahead: int = 0) -> Optional[str]:
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else None

    def kw(self, ahead: int = 0) -> Optional[str]:
        t = self.peek(ahead)
        return t.upper() if t is not None else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise GraphDdlError("unexpected end of Graph DDL input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, token: str) -> str:
        t = self.next()
        if t.upper() != token.upper():
            raise GraphDdlError(f"expected `{token}` but found `{t}`")
        return t

    def ident(self) -> str:
        t = self.next()
        if t.startswith("`"):
            return t[1:-1]
        if not re.match(r"[A-Za-z_]", t):
            raise GraphDdlError(f"expected an identifier, found `{t}`")
        return t

    def dotted_ident(self) -> str:
        parts = [self.ident()]
        while self.peek() == ".":
            self.next()
            parts.append(self.ident())
        return ".".join(parts)

    # -- statements --------------------------------------------------------

    def document(self) -> DdlDocument:
        doc = DdlDocument()
        while self.peek() is not None:
            if self.kw() == "SET":
                self.next()
                self.expect("SCHEMA")
                doc.set_schema = self.dotted_ident()
            elif self.kw() == "CREATE":
                self.next()
                what = self.kw()
                if what == "ELEMENT":
                    self.next()
                    self.expect("TYPE")
                    et = self.element_type()
                    doc.element_types[et.name] = et
                elif what == "GRAPH" and self.kw(1) == "TYPE":
                    self.next()
                    self.next()
                    name = self.ident()
                    g = GraphDef(name)
                    self.graph_body(g)
                    doc.graph_types[name] = g
                elif what == "GRAPH":
                    self.next()
                    name = self.ident()
                    g = GraphDef(name)
                    if self.kw() == "OF":
                        self.next()
                        g.of_type = self.ident()
                    self.graph_body(g)
                    doc.graphs[name] = g
                else:
                    raise GraphDdlError(f"cannot CREATE `{self.peek()}`")
            else:
                raise GraphDdlError(f"unexpected token `{self.peek()}`")
        return doc

    def element_type(self) -> ElementType:
        name = self.ident()
        props: Dict[str, Tuple[str, bool]] = {}
        if self.peek() == "(":
            self.next()
            while self.peek() != ")":
                p = self.ident()
                tname = self.next().upper()
                if tname not in _TYPES:
                    raise GraphDdlError(
                        f"unknown property type `{tname}` (supported: {sorted(_TYPES)})"
                    )
                nullable = False
                if self.peek() == "?":
                    self.next()
                    nullable = True
                props[p] = (_TYPES[tname], nullable)
                if self.peek() == ",":
                    self.next()
            self.expect(")")
        return ElementType(name, props)

    def label_combo(self) -> Tuple[str, ...]:
        self.expect("(")
        labels = [self.ident()]
        while self.peek() == ",":
            self.next()
            labels.append(self.ident())
        self.expect(")")
        return tuple(labels)

    def column_aliases(self) -> Dict[str, str]:
        """( col AS prop, ... ) -> {prop -> col}"""
        out: Dict[str, str] = {}
        self.expect("(")
        while self.peek() != ")":
            col = self.ident()
            self.expect("AS")
            prop = self.ident()
            out[prop] = col
            if self.peek() == ",":
                self.next()
        self.expect(")")
        return out

    def endpoint(self, which: str) -> EndpointDef:
        self.expect(which)
        self.expect("NODES")
        labels = self.label_combo()
        self.expect("FROM")
        view = self.dotted_ident()
        alias = self.ident()
        self.expect("JOIN")
        self.expect("ON")
        join: List[Tuple[str, str]] = []
        while True:
            a_alias = self.ident()
            self.expect(".")
            a_col = self.ident()
            self.expect("=")
            b_alias = self.ident()
            self.expect(".")
            b_col = self.ident()
            join.append(((a_alias, a_col), (b_alias, b_col)))
            if self.kw() == "AND":
                self.next()
            else:
                break
        return EndpointDef(labels, view, alias, join)

    def graph_body(self, g: GraphDef) -> None:
        self.expect("(")
        while self.peek() != ")":
            if self.peek() != "(":
                et = self.element_type()
                g.element_types[et.name] = et
            else:
                first = self.label_combo()
                if self.peek() == "-[":
                    self.next()
                    rel_type = self.ident()
                    self.expect("]->")
                    dst = self.label_combo()
                    rm = RelMappingDef(first, rel_type, dst)
                    while self.kw() == "FROM":
                        rm.views.append(self.rel_view())
                    g.rels.append(rm)
                else:
                    nm = NodeMappingDef(first)
                    while self.kw() == "FROM":
                        self.next()
                        view = self.dotted_ident()
                        aliases = (
                            self.column_aliases() if self.peek() == "(" else {}
                        )
                        nm.views.append((view, aliases))
                    g.nodes.append(nm)
            if self.peek() == ",":
                self.next()
        self.expect(")")

    def rel_view(self):
        self.expect("FROM")
        view = self.dotted_ident()
        alias = "edge"
        if self.peek() != "(" and self.kw() != "START":
            alias = self.ident()
        aliases = self.column_aliases() if self.peek() == "(" else {}
        start = self.endpoint("START")
        end = self.endpoint("END")

        def orient(ep: EndpointDef) -> EndpointDef:
            join = []
            for (aa, ac), (ba, bc) in ep.join:
                if aa == ep.alias and ba == alias:
                    join.append((ac, bc))
                elif aa == alias and ba == ep.alias:
                    join.append((bc, ac))
                else:
                    raise GraphDdlError(
                        f"JOIN ON must relate `{ep.alias}` and `{alias}`, "
                        f"found `{aa}` and `{ba}`"
                    )
            return EndpointDef(ep.labels, ep.view, ep.alias, join)

        return (view, alias, aliases, orient(start), orient(end))


def parse_ddl(text: str) -> DdlDocument:
    return _Parser(_tokenize(text)).document()


# --------------------------------------------------------------------------
# build: DDL document + table resolver -> PropertyGraph
# --------------------------------------------------------------------------

def _resolve(tables, set_schema: Optional[str], view: str) -> DataFrame:
    if isinstance(tables, SparkSession):
        name = view if "." in view or not set_schema else f"{set_schema}.{view}"
        return tables.table(name)
    for key in (view, view.rsplit(".", 1)[-1]):
        if key in tables:
            return tables[key]
    raise GraphDdlError(f"table/view `{view}` not found")


def _merged_element_types(doc: DdlDocument, g: GraphDef) -> Dict[str, ElementType]:
    out = dict(doc.element_types)
    if g.of_type is not None:
        gt = doc.graph_types.get(g.of_type)
        if gt is None:
            raise GraphDdlError(f"graph type `{g.of_type}` is not defined")
        out.update(gt.element_types)
    out.update(g.element_types)
    return out


def _combo_props(
    ets: Dict[str, ElementType], labels: Sequence[str]
) -> Dict[str, Tuple[str, bool]]:
    props: Dict[str, Tuple[str, bool]] = {}
    for l in labels:
        et = ets.get(l)
        if et is None:
            raise GraphDdlError(f"element type `{l}` is not defined")
        for p, (t, n) in et.props.items():
            if p in props and props[p][0] != t:
                raise GraphDdlError(
                    f"property `{p}` declared with conflicting types in {labels}"
                )
            props[p] = (t, n)
    return props


def _node_tag(labels: Sequence[str]) -> str:
    return "N:" + ",".join(sorted(labels))


def _hashed_id(tag: str, view: str, cols: Sequence[str]) -> F.Column:
    return F.xxhash64(F.lit(tag), F.lit(view), *[F.col(c) for c in cols])


def build_graph(
    doc: Union[str, DdlDocument],
    graph_name: Optional[str] = None,
    tables: Union[SparkSession, Dict[str, DataFrame], None] = None,
) -> PropertyGraph:
    """Materialize one CREATE GRAPH definition as a PropertyGraph.

    ``tables``: a SparkSession (views resolve through the catalog,
    qualified by SET SCHEMA) or a {name -> DataFrame} dict."""
    if isinstance(doc, str):
        doc = parse_ddl(doc)
    if not doc.graphs:
        raise GraphDdlError("DDL defines no CREATE GRAPH")
    if graph_name is None:
        if len(doc.graphs) > 1:
            raise GraphDdlError(
                f"DDL defines several graphs {sorted(doc.graphs)}; pass graph_name"
            )
        graph_name = next(iter(doc.graphs))
    g = doc.graphs.get(graph_name)
    if g is None:
        raise GraphDdlError(f"graph `{graph_name}` is not defined")
    ets = _merged_element_types(doc, g)
    if g.of_type is not None:
        gt = doc.graph_types[g.of_type]
        # inherit type-level node/rel declarations that carry no mappings
        known_nodes = {nm.labels for nm in g.nodes}
        g = GraphDef(
            g.name,
            g.of_type,
            g.element_types,
            g.nodes + [nm for nm in gt.nodes if nm.labels not in known_nodes],
            g.rels
            + [
                rm
                for rm in gt.rels
                if not any(
                    (r.src_labels, r.rel_type, r.dst_labels)
                    == (rm.src_labels, rm.rel_type, rm.dst_labels)
                    for r in g.rels
                )
            ],
        )

    # node-view key columns: the node-side JOIN columns of every
    # relationship mapping that references (labels, view) — must agree
    keys: Dict[Tuple[FrozenSet[str], str], Tuple[str, ...]] = {}
    for rm in g.rels:
        for _, _, _, start, end in rm.views:
            for ep in (start, end):
                k = (frozenset(ep.labels), ep.view)
                cols = tuple(c for c, _ in sorted(ep.join))
                if keys.setdefault(k, cols) != cols:
                    raise GraphDdlError(
                        f"inconsistent join keys for node view `{ep.view}`: "
                        f"{keys[k]} vs {cols}"
                    )

    node_tables: List[NodeTable] = []
    for nm in g.nodes:
        if not nm.views:
            continue
        props = _combo_props(ets, nm.labels)
        tag = _node_tag(nm.labels)
        parts = []
        for view, aliases in nm.views:
            df = _resolve(tables, doc.set_schema, view)
            cols_for = {p: aliases.get(p, p) for p in props}
            for p, c in cols_for.items():
                if c not in df.columns:
                    raise GraphDdlError(
                        f"view `{view}` has no column `{c}` for property `{p}`"
                    )
            key_cols = keys.get(
                (frozenset(nm.labels), view),
                tuple(sorted(cols_for.values())) or tuple(df.columns),
            )
            sel = [_hashed_id(tag, view, key_cols).alias("id")]
            sel += [
                F.col(c).cast(t).alias(p)
                for p, c in sorted(cols_for.items())
                for t, _ in [props[p]]
            ]
            parts.append(df.select(*sel))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        node_tables.append(NodeTable.create(nm.labels, out))

    rel_tables: List[RelationshipTable] = []
    for rm in g.rels:
        props = _combo_props(ets, [rm.rel_type])
        tag = f"R:{rm.rel_type}"
        for view, alias, aliases, start, end in rm.views:
            df = _resolve(tables, doc.set_schema, view)
            cols_for = {p: aliases.get(p, p) for p in props}
            for p, c in cols_for.items():
                if c not in df.columns:
                    raise GraphDdlError(
                        f"view `{view}` has no column `{c}` for property `{p}`"
                    )
            start_edge = [e for _, e in sorted(start.join)]
            end_edge = [e for _, e in sorted(end.join)]
            # the rel view's own `id` column keys the relationship identity
            # when present; otherwise the endpoint foreign keys do (parallel
            # edges then need an id column — fail-fast is better than
            # silently collapsing them at query time)
            rel_key = ["id"] if "id" in df.columns else start_edge + end_edge
            sel = [
                _hashed_id(tag, view, rel_key).alias("id"),
                _hashed_id(_node_tag(start.labels), start.view, start_edge).alias("src"),
                _hashed_id(_node_tag(end.labels), end.view, end_edge).alias("dst"),
            ]
            sel += [
                F.col(c).cast(t).alias(p)
                for p, c in sorted(cols_for.items())
                for t, _ in [props[p]]
            ]
            rel_tables.append(
                RelationshipTable.create(
                    rm.rel_type,
                    df.select(*sel),
                    src_labels=rm.src_labels,
                    dst_labels=rm.dst_labels,
                )
            )

    return PropertyGraph(node_tables, rel_tables, name=graph_name)


def graph_names(doc: Union[str, DdlDocument]) -> List[str]:
    if isinstance(doc, str):
        doc = parse_ddl(doc)
    return sorted(doc.graphs)
