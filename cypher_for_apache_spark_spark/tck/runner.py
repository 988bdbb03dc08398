"""Gherkin-subset scenario runner for TCK-style acceptance features.

Supported steps (the subset the openCypher TCK uses for tabular-result
scenarios; reference integration: morpheus-tck/.../TckSparkCypherTest.scala):

- ``Given an empty graph`` / ``Given any graph``
- ``And having executed:`` + docstring of CREATE statements
- ``When executing query:`` + docstring
- ``Then the result should be, in any order:`` + result table
- ``Then the result should be, in order:`` + result table
- ``Then the result should be empty``
- ``Then a <ErrorType> should be raised`` (any engine error satisfies it —
  error-code taxonomy parity is not claimed)
- ``And no side effects`` (no-op: the engine is read-only, like the
  reference's Cypher-9 surface)

Table cells hold TCK value literals: integers, floats, single-quoted
strings, ``true``/``false``, ``null``, and bracketed lists thereof.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import List, Optional

from cypher_for_apache_spark_spark.tck.create_graph import graph_from_create


@dataclass
class Scenario:
    name: str
    feature: str = ""
    init: List[str] = field(default_factory=list)
    query: Optional[str] = None
    expect_rows: Optional[List[dict]] = None
    ordered: bool = False
    expect_error: bool = False
    expect_empty: bool = False

    @property
    def key(self) -> str:
        return f"{self.feature}::{self.name}"


def _parse_cell(text: str):
    s = text.strip()
    if s == "null":
        return None
    if s == "true":
        return True
    if s == "false":
        return False
    if s.startswith("'") and s.endswith("'"):
        return s[1:-1]
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1].strip()
        if not inner:
            return []
        # split on top-level commas (no nested lists in our features)
        return [_parse_cell(p) for p in inner.split(",")]
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    if re.fullmatch(r"-?\d+\.\d+(e-?\d+)?", s, re.I):
        return float(s)
    raise ValueError(f"unsupported TCK value literal: {text!r}")


def _parse_table(lines: List[str]) -> List[dict]:
    split = [
        [c.strip() for c in ln.strip().strip("|").split("|")] for ln in lines
    ]
    header, rows = split[0], split[1:]
    return [dict(zip(header, (_parse_cell(c) for c in row))) for row in rows]


def parse_feature(text: str, feature_name: str = "") -> List[Scenario]:
    lines = text.splitlines()
    scenarios: List[Scenario] = []
    cur: Optional[Scenario] = None
    i = 0

    def docstring(start: int):
        assert lines[start].strip() == '"""', f"expected docstring at line {start + 1}"
        body = []
        j = start + 1
        while lines[j].strip() != '"""':
            body.append(lines[j])
            j += 1
        return "\n".join(body), j + 1

    def table(start: int):
        j = start
        rows = []
        while j < len(lines) and lines[j].strip().startswith("|"):
            rows.append(lines[j])
            j += 1
        return rows, j

    while i < len(lines):
        ln = lines[i].strip()
        if ln.startswith("Feature:") and not feature_name:
            feature_name = ln[len("Feature:"):].strip()
            i += 1
        elif ln.startswith("Scenario:"):
            cur = Scenario(name=ln[len("Scenario:"):].strip(), feature=feature_name)
            scenarios.append(cur)
            i += 1
        elif ln.startswith(("Given an empty graph", "Given any graph")):
            i += 1
        elif ln.startswith("And having executed:"):
            stmt, i = docstring(i + 1)
            cur.init.append(stmt)
        elif ln.startswith("When executing query:"):
            cur.query, i = docstring(i + 1)
        elif ln.startswith("Then the result should be, in any order:"):
            rows, i = table(i + 1)
            cur.expect_rows, cur.ordered = _parse_table(rows), False
        elif ln.startswith("Then the result should be, in order:"):
            rows, i = table(i + 1)
            cur.expect_rows, cur.ordered = _parse_table(rows), True
        elif ln.startswith("Then the result should be empty"):
            cur.expect_empty = True
            i += 1
        elif re.match(r"Then an? \w+ should be raised", ln):
            cur.expect_error = True
            i += 1
        elif ln.startswith("And no side effects") or not ln or ln.startswith("#"):
            i += 1
        else:
            raise ValueError(f"unsupported feature step: {ln!r}")
    return scenarios


def _canon(v):
    if isinstance(v, float):
        return ("f", round(v, 9)) if not math.isnan(v) else ("f", "nan")
    if isinstance(v, list):
        return ("l", tuple(_canon(x) for x in v))
    return (type(v).__name__, v)


def _rows_of(df) -> List[dict]:
    return [row.asDict(recursive=True) for row in df.collect()]


def run_scenario(session, spark, scenario: Scenario) -> None:
    """Execute one scenario; raises AssertionError (or the engine error)
    on mismatch."""
    graph = graph_from_create(spark, ";".join(scenario.init))
    graph._session = session
    if scenario.expect_error:
        try:
            graph.cypher(scenario.query).df.collect()
        except Exception:
            return
        raise AssertionError(f"{scenario.key}: expected an error, query succeeded")
    got = _rows_of(graph.cypher(scenario.query).df)
    if scenario.expect_empty:
        assert got == [], f"{scenario.key}: expected empty result, got {got}"
        return
    want = scenario.expect_rows or []
    assert len(got) == len(want), f"{scenario.key}: {len(got)} rows, want {len(want)}"
    if got:
        assert set(got[0]) == set(want[0]), (
            f"{scenario.key}: columns {sorted(got[0])} want {sorted(want[0])}"
        )
    cols = sorted(want[0]) if want else []
    g = [tuple(_canon(r[c]) for c in cols) for r in got]
    w = [tuple(_canon(r[c]) for c in cols) for r in want]
    if not scenario.ordered:
        g, w = sorted(g), sorted(w)
    assert g == w, f"{scenario.key}:\n  got  {g}\n  want {w}"
