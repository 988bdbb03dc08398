"""Expression + query AST for the Cypher subset.

Mirrors the reference's IR expression inventory
(okapi-ir/src/main/scala/org/opencypher/okapi/ir/api/expr/Expr.scala, ~157
node types — see SURVEY.md §2.4 for the line-by-line map) as compact Python
dataclasses. The same nodes serve as parser output and planner input (the
reference inserts a block IR in between, okapi-ir/.../api/QueryModel.scala:33;
we plan straight from the AST — simpler, same semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple


class Expr:
    """Base class for expressions."""

    def children(self) -> List["Expr"]:
        out = []
        for v in self.__dict__.values():
            if isinstance(v, Expr):
                out.append(v)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, Expr):
                        out.append(x)
                    elif isinstance(x, tuple):
                        out.extend(y for y in x if isinstance(y, Expr))
        return out

    def walk(self):
        yield self
        for c in self.children():
            yield from c.walk()


@dataclass
class Var(Expr):
    name: str


@dataclass
class Param(Expr):
    name: str


@dataclass
class Lit(Expr):
    value: object  # int | float | str | bool | None


@dataclass
class ListLit(Expr):
    items: List[Expr]


@dataclass
class MapLit(Expr):
    items: List[Tuple[str, Expr]]


@dataclass
class Prop(Expr):
    subject: Expr
    key: str


@dataclass
class HasLabels(Expr):
    subject: Expr
    labels: List[str]


@dataclass
class Not(Expr):
    expr: Expr


@dataclass
class Ands(Expr):
    items: List[Expr]


@dataclass
class Ors(Expr):
    items: List[Expr]


@dataclass
class Xor(Expr):
    lhs: Expr
    rhs: Expr


@dataclass
class Cmp(Expr):
    op: str  # '=', '<>', '<', '<=', '>', '>='
    lhs: Expr
    rhs: Expr


@dataclass
class IsNull(Expr):
    expr: Expr


@dataclass
class IsNotNull(Expr):
    expr: Expr


@dataclass
class StringPred(Expr):
    op: str  # 'startswith' | 'endswith' | 'contains' | 'regex'
    lhs: Expr
    rhs: Expr


@dataclass
class In(Expr):
    lhs: Expr
    rhs: Expr


@dataclass
class Bin(Expr):
    op: str  # '+', '-', '*', '/', '%', '^'
    lhs: Expr
    rhs: Expr


@dataclass
class Neg(Expr):
    expr: Expr


@dataclass
class FuncCall(Expr):
    name: str  # lower-cased
    args: List[Expr]
    distinct: bool = False


@dataclass
class CountStar(Expr):
    pass


@dataclass
class CaseExpr(Expr):
    operand: Optional[Expr]  # simple CASE when set
    whens: List[Tuple[Expr, Expr]]
    default: Optional[Expr]


@dataclass
class ListComp(Expr):
    var: str
    source: Expr
    where: Optional[Expr]
    projection: Optional[Expr]


@dataclass
class Quantified(Expr):
    kind: str  # 'any' | 'all' | 'none' | 'single'
    var: str
    source: Expr
    where: Expr


@dataclass
class Reduce(Expr):
    acc: str
    init: Expr
    var: str
    source: Expr
    expr: Expr


@dataclass
class Index(Expr):
    subject: Expr
    index: Expr


@dataclass
class Slice(Expr):
    subject: Expr
    lo: Optional[Expr]
    hi: Optional[Expr]


@dataclass
class MapProjection(Expr):
    """``v {.key, alias: expr, .*}`` (reference: MapProjection,
    Expr.scala:518)."""

    subject: str  # variable name
    items: List[Tuple[str, Optional[Expr]]]  # (name, None = .name shorthand)
    all_props: bool = False  # .*


@dataclass
class PatternPredicate(Expr):
    """A pattern used as a boolean predicate (``WHERE (a)-[:T]->(b)`` or
    ``exists(...)`` / ``EXISTS { ... }``) — reference: ExistsPatternExpr,
    Expr.scala:1316, planned as a left-outer marker join
    (RelationalPlanner.scala:224-246)."""

    pattern: "PatternPart"
    where: Optional[Expr] = None
    negated: bool = False


@dataclass
class PatternComprehension(Expr):
    """``[(a)-[:T]->(b) WHERE pred | projection]`` — a correlated pattern
    subquery producing a list per row. The reference does NOT support
    these (its TCK blacklist marks the whole PatternComprehension family
    failing); here they lower to the same pattern-subquery machinery as
    EXISTS, aggregated with collect_list instead of a marker."""

    pattern: "PatternPart"
    projection: Expr
    where: Optional[Expr] = None


# -- patterns ---------------------------------------------------------------


@dataclass
class NodePat:
    var: Optional[str]
    labels: List[str] = field(default_factory=list)
    props: Optional[MapLit] = None


@dataclass
class RelPat:
    var: Optional[str]
    types: List[str] = field(default_factory=list)
    direction: str = "out"  # 'out' | 'in' | 'both'
    props: Optional[MapLit] = None
    var_length: Optional[Tuple[int, Optional[int]]] = None  # (lower, upper)


@dataclass
class PatternPart:
    # alternating [NodePat, RelPat, NodePat, RelPat, ...]
    elements: list
    path_var: Optional[str] = None
    # shortestPath(...) / allShortestPaths(...) wrapper: 'single' | 'all'
    shortest: Optional[str] = None

    @property
    def nodes(self) -> List[NodePat]:
        return self.elements[0::2]

    @property
    def rels(self) -> List[RelPat]:
        return self.elements[1::2]


# -- clauses ------------------------------------------------------------------


@dataclass
class OrderItem:
    expr: Expr
    asc: bool = True


@dataclass
class MatchClause:
    parts: List[PatternPart]
    where: Optional[Expr] = None
    optional: bool = False


@dataclass
class UnwindClause:
    expr: Expr
    var: str


@dataclass
class ProjectionClause:
    """Shared body of WITH / RETURN."""

    items: List[Tuple[Expr, str]]  # (expr, output name)
    distinct: bool = False
    star: bool = False
    order_by: List[OrderItem] = field(default_factory=list)
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None
    where: Optional[Expr] = None  # WITH ... WHERE only
    is_return: bool = False


@dataclass
class FromGraphClause:
    graph_name: str  # catalog graph, view name, or $parameter (views)
    view_args: Optional[List[str]] = None  # set when invoking a view


@dataclass
class SetItem:
    subject: str  # variable
    key: Optional[str]  # property name; None for label set
    labels: List[str] = field(default_factory=list)
    value: Optional[Expr] = None


@dataclass
class ConstructClause:
    """CONSTRUCT [ON g...] [CLONE v...] [NEW pattern...] [SET items]
    (reference: ConstructGraphPlanner, Cypher 10 multiple-graph support)."""

    on_graphs: List[str] = field(default_factory=list)
    clones: List[str] = field(default_factory=list)
    news: List["PatternPart"] = field(default_factory=list)
    sets: List[SetItem] = field(default_factory=list)


@dataclass
class ReturnGraphClause:
    pass


@dataclass
class CreateGraphStatement:
    name: str
    inner: object  # SingleQuery | UnionQuery


@dataclass
class DeleteGraphStatement:
    name: str


@dataclass
class CreateViewStatement:
    """CATALOG CREATE VIEW name($g, ...) { query } — a parameterized Cypher
    snippet over graph parameters (reference: CreateViewStatement,
    okapi-ir/.../api/CypherStatement.scala:33-80)."""

    name: str
    params: List[str]
    inner: object  # SingleQuery | UnionQuery


@dataclass
class DeleteViewStatement:
    name: str


@dataclass
class CallSubquery:
    """CALL { [WITH imports] ... RETURN ... }: the inner query runs against
    the importing WITH's variables (correlated) or standalone."""

    query: "SingleQuery"


@dataclass
class CallProcedure:
    """CALL name(args) [YIELD col [AS alias], ... [WHERE pred]]: invoke a
    registered procedure (procedures.py). ``yields`` is None for a
    standalone call (terminal clause — yields every declared column as the
    query result)."""

    name: str
    args: List[Expr]
    yields: Optional[List[Tuple[str, str]]]  # (column, alias)
    where: Optional[Expr] = None


@dataclass
class SingleQuery:
    clauses: list  # MatchClause | UnwindClause | ProjectionClause | FromGraph...


@dataclass
class UnionQuery:
    queries: List[SingleQuery]
    all_flags: List[bool]  # len == len(queries) - 1


def substitute(e: Expr, pairs: List[Tuple[Expr, Expr]]) -> Expr:
    """Structurally replace subtrees: every node equal to a ``target`` becomes
    its ``replacement``. Used to split aggregate subtrees out of projection
    items (the openCypher front-end's isolateAggregation rewrite —
    CypherParser.scala:66-81 — done at plan time here)."""
    import dataclasses

    for target, repl in pairs:
        if e == target:
            return repl

    if not dataclasses.is_dataclass(e):
        return e
    kwargs = {}
    changed = False
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, Expr):
            nv = substitute(v, pairs)
            changed = changed or nv is not v
            kwargs[f.name] = nv
        elif isinstance(v, list):
            nl = []
            for x in v:
                if isinstance(x, Expr):
                    nx = substitute(x, pairs)
                    changed = changed or nx is not x
                    nl.append(nx)
                elif isinstance(x, tuple):
                    nt = tuple(
                        substitute(y, pairs) if isinstance(y, Expr) else y for y in x
                    )
                    changed = changed or nt != x
                    nl.append(nt)
                else:
                    nl.append(x)
            kwargs[f.name] = nl
        else:
            kwargs[f.name] = v
    if not changed:
        return e
    return type(e)(**kwargs)


def aggregate_subtrees(e: Expr) -> List[Expr]:
    """Maximal aggregate subtrees within ``e`` (outermost wins)."""
    from cypher_for_apache_spark_spark.functions.registry import AGGREGATES

    out: List[Expr] = []

    def visit(n: Expr):
        if isinstance(n, CountStar) or (
            isinstance(n, FuncCall) and n.name in AGGREGATES
        ):
            if n not in out:
                out.append(n)
            return
        for c in n.children():
            visit(c)

    visit(e)
    return out


def contains_aggregate(e: Expr) -> bool:
    from cypher_for_apache_spark_spark.functions.registry import AGGREGATES

    for node in e.walk():
        if isinstance(node, CountStar):
            return True
        if isinstance(node, FuncCall) and node.name in AGGREGATES:
            return True
    return False
