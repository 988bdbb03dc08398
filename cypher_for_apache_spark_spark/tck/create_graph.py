"""Build a PropertyGraph from Cypher CREATE statements — the TCK "initial
graph" factory (reference: morpheus-testing
CreateGraphFactory / okapi-tck's initQueries handling). TCK fixture graphs
are tiny by construction, so assembly is driver-side; the resulting element
tables are ordinary DataFrames and every query against them runs through
the full distributed planner.

Reuses the engine's own parser for patterns and literal maps — there is no
second CREATE grammar to drift out of sync.
"""

from __future__ import annotations

import datetime
from typing import Dict, List, Optional, Tuple

from pyspark.sql import SparkSession, types as T

from cypher_for_apache_spark_spark import ast as A
from cypher_for_apache_spark_spark.graph import (
    NodeTable,
    PropertyGraph,
    RelationshipTable,
)
from cypher_for_apache_spark_spark.parser import CypherSyntaxError, Parser


def _literal(expr: A.Expr):
    if isinstance(expr, A.Lit):
        return expr.value
    if isinstance(expr, A.ListLit):
        return [_literal(e) for e in expr.items]
    if isinstance(expr, A.Neg):
        return -_literal(expr.expr)
    # constant temporal constructors (TCK fixtures use them as literals)
    if isinstance(expr, A.FuncCall) and len(expr.args) == 1:
        name = expr.name.lower()
        arg = _literal(expr.args[0])
        if isinstance(arg, str):
            if name == "date":
                return datetime.date.fromisoformat(arg)
            if name == "localdatetime":
                return datetime.datetime.fromisoformat(arg)
            if name == "duration":
                from cypher_for_apache_spark_spark.functions.compiler import (
                    _parse_iso_duration,
                )

                d, h, mi, s = _parse_iso_duration(arg)
                return datetime.timedelta(days=d, hours=h, minutes=mi, seconds=s)
    raise CypherSyntaxError(
        f"CREATE supports literal properties only, got {type(expr).__name__}"
    )


def _props(m: Optional[A.MapLit]) -> Dict[str, object]:
    if m is None:
        return {}
    return {k: _literal(v) for k, v in m.items}


class _Builder:
    def __init__(self) -> None:
        self.nodes: List[dict] = []  # {id, labels: frozenset, props}
        self.rels: List[dict] = []  # {id, src, dst, type, props}
        self._next_id = 0

    def nid(self) -> int:
        self._next_id += 1
        return self._next_id - 1

    def run_create(self, stmt: str) -> None:
        """One CREATE statement: comma-separated pattern parts sharing a
        variable scope."""
        p = Parser(stmt)
        if not (p.tok.kind in ("kw", "ident") and p.tok.value.upper() == "CREATE"):
            raise CypherSyntaxError(f"expected CREATE statement, got {stmt!r}")
        p.advance()
        parts = [p.parse_pattern_part()]
        while p.eat(","):
            parts.append(p.parse_pattern_part())
        env: Dict[str, int] = {}
        for part in parts:
            prev: Optional[int] = None
            prev_rel: Optional[A.RelPat] = None
            for el in part.elements:
                if isinstance(el, A.NodePat):
                    if el.var is not None and el.var in env:
                        cur = env[el.var]
                        if el.labels or el.props:
                            raise CypherSyntaxError(
                                f"bound variable {el.var} cannot add labels/properties"
                            )
                    else:
                        cur = self.nid()
                        self.nodes.append(
                            {
                                "id": cur,
                                "labels": frozenset(el.labels),
                                "props": _props(el.props),
                            }
                        )
                        if el.var is not None:
                            env[el.var] = cur
                    if prev_rel is not None:
                        src, dst = (prev, cur) if prev_rel.direction == "out" else (cur, prev)
                        if prev_rel.direction == "both" or len(prev_rel.types) != 1:
                            raise CypherSyntaxError(
                                "CREATE relationships need a direction and exactly one type"
                            )
                        self.rels.append(
                            {
                                "id": self.nid(),
                                "src": src,
                                "dst": dst,
                                "type": prev_rel.types[0],
                                "props": _props(prev_rel.props),
                            }
                        )
                        prev_rel = None
                    prev = cur
                else:
                    prev_rel = el


def _spark_type(values: List[object]) -> T.DataType:
    for v in values:
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, str):
            return T.StringType()
        if isinstance(v, datetime.datetime):
            return T.TimestampNTZType()
        if isinstance(v, datetime.date):
            return T.DateType()
        if isinstance(v, datetime.timedelta):
            return T.DayTimeIntervalType()
        if isinstance(v, list):
            inner = _spark_type([x for x in v])
            return T.ArrayType(inner)
    return T.StringType()  # all-null column


def _frame(spark: SparkSession, rows: List[dict], fixed: List[Tuple[str, T.DataType]]):
    keys: List[str] = []
    for r in rows:
        for k in r["props"]:
            if k not in keys:
                keys.append(k)
    fields = [T.StructField(n, t, False) for n, t in fixed]
    for k in keys:
        vals = [r["props"].get(k) for r in rows]
        fields.append(T.StructField(k, _spark_type(vals), True))
    data = [
        tuple(r[n] for n, _ in fixed) + tuple(r["props"].get(k) for k in keys)
        for r in rows
    ]
    return spark.createDataFrame(data, T.StructType(fields))


def graph_from_create(
    spark: SparkSession, statements: str, name: str = "tck"
) -> PropertyGraph:
    """Parse one or more ``CREATE ...`` statements (separated by ``;``) and
    materialize the described graph as element tables."""
    b = _Builder()
    for stmt in statements.split(";"):
        stmt = stmt.strip()
        if stmt:
            b.run_create(stmt)
    node_tables = []
    by_combo: Dict[frozenset, List[dict]] = {}
    for n in b.nodes:
        by_combo.setdefault(n["labels"], []).append(n)
    for combo, rows in by_combo.items():
        df = _frame(spark, rows, [("id", T.LongType())])
        node_tables.append(NodeTable.create(sorted(combo), df))
    rel_tables = []
    by_type: Dict[str, List[dict]] = {}
    for r in b.rels:
        by_type.setdefault(r["type"], []).append(r)
    for rtype, rows in by_type.items():
        df = _frame(
            spark,
            rows,
            [("id", T.LongType()), ("src", T.LongType()), ("dst", T.LongType())],
        )
        rel_tables.append(RelationshipTable.create(rtype, df))
    return PropertyGraph(node_tables, rel_tables, name=name)
