"""openCypher TCK expected-value language.

Parses the value literals that appear in TCK result tables and parameter
tables (openCypher/tck/, format shared by every TCK consumer; reference
integration: morpheus-tck/.../TckSparkCypherTest.scala) into canonical
Python structures that can be compared against engine output:

- integers / floats (incl. scientific notation), ``true``/``false``,
  ``null``, single-quoted strings with backslash escapes
- lists ``[1, 'a', [2]]`` and maps ``{k: 1, nested: {x: 2}}``
- nodes ``(:L1:L2 {p: 1})``, relationships ``[:T {p: 1}]``, and paths
  ``<(a)-[:T]->(b)>``

Elements canonicalize WITHOUT ids (the TCK never exposes ids): a node is
``("node", frozenset(labels), props)``, a relationship is
``("rel", type, props)`` — the same shape ``canon_engine_value`` produces
for the engine's struct-typed node/relationship columns, so expected and
actual values compare with ``==``.
"""

from __future__ import annotations

import math
import re
from typing import Any, List, Tuple

_NUM_INT = re.compile(r"-?\d+$")
_NUM_FLOAT = re.compile(r"-?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")


class TckValueError(ValueError):
    pass


class _Parser:
    """Recursive-descent parser over a TCK value literal string."""

    def __init__(self, text: str):
        self.s = text
        self.i = 0

    # -- low level ---------------------------------------------------------
    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def expect(self, ch: str) -> None:
        if not self.s.startswith(ch, self.i):
            raise TckValueError(f"expected {ch!r} at {self.s[self.i:self.i+20]!r}")
        self.i += len(ch)

    def _bare(self) -> str:
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] in "_$"):
            j += 1
        tok, self.i = self.s[self.i : j], j
        return tok

    # -- values ------------------------------------------------------------
    def value(self) -> Any:
        self.ws()
        c = self.peek()
        if c == "'":
            return self.string()
        if c == "[":
            # relationship literal vs list: a rel starts with [:
            j = self.i + 1
            while j < len(self.s) and self.s[j].isspace():
                j += 1
            if j < len(self.s) and self.s[j] == ":":
                return self.relationship()
            return self.list_()
        if c == "{":
            return self.map_()
        if c == "(":
            return self.node()
        if c == "<":
            return self.path()
        tok = self._bare()
        if tok == "null":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok in ("NaN",):
            return float("nan")
        # number (sign not matched by _bare)
        if not tok and c == "-":
            self.i += 1
            rest = self.number()
            return -rest
        if tok:
            return self._number_from(tok)
        raise TckValueError(f"cannot parse value at {self.s[self.i:self.i+20]!r}")

    def _number_from(self, tok: str) -> Any:
        # may continue with .digits / exponent which _bare stopped at
        j = self.i
        while j < len(self.s) and (self.s[j].isdigit() or self.s[j] in ".eE+-"):
            # only consume exponent signs directly after e/E
            if self.s[j] in "+-" and self.s[j - 1] not in "eE":
                break
            j += 1
        tok, self.i = tok + self.s[self.i : j], j
        if _NUM_INT.match(tok):
            return int(tok)
        if _NUM_FLOAT.match(tok):
            return float(tok)
        raise TckValueError(f"bad number literal {tok!r}")

    def number(self) -> Any:
        tok = self._bare()
        return self._number_from(tok)

    def string(self) -> str:
        self.expect("'")
        out = []
        while True:
            if self.i >= len(self.s):
                raise TckValueError("unterminated string")
            c = self.s[self.i]
            if c == "\\":
                out.append(self.s[self.i + 1])
                self.i += 2
            elif c == "'":
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1

    def list_(self) -> List[Any]:
        self.expect("[")
        out = []
        self.ws()
        if self.peek() == "]":
            self.i += 1
            return out
        while True:
            out.append(self.value())
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.expect("]")
            return out

    def map_(self) -> dict:
        self.expect("{")
        out = {}
        self.ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.ws()
            key = self._bare()
            if not key:
                raise TckValueError(f"bad map key at {self.s[self.i:self.i+20]!r}")
            self.ws()
            self.expect(":")
            out[key] = self.value()
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.expect("}")
            return out

    def _labels(self) -> List[str]:
        labels = []
        while True:
            self.ws()
            if self.peek() != ":":
                return labels
            self.i += 1
            labels.append(self._bare())

    def node(self) -> Tuple:
        self.expect("(")
        labels = self._labels()
        self.ws()
        props = self.map_() if self.peek() == "{" else {}
        self.ws()
        self.expect(")")
        return ("node", frozenset(labels), canon(props))

    def relationship(self) -> Tuple:
        self.expect("[")
        self.ws()
        self.expect(":")
        rtype = self._bare()
        self.ws()
        props = self.map_() if self.peek() == "{" else {}
        self.ws()
        self.expect("]")
        return ("rel", rtype, canon(props))

    def path(self) -> Tuple:
        """``<(a)-[:T]->(b)>`` — sequence of node/rel elements with
        direction markers folded into the rel entries."""
        self.expect("<")
        elems = [self.node()]
        while True:
            self.ws()
            if self.peek() == ">":
                self.i += 1
                return ("path", tuple(elems))
            if self.s.startswith("<-", self.i):
                self.i += 2
                rel = self.relationship()
                self.expect("-")
                nxt = self.node()
                elems.append(("rel_rev",) + rel[1:])
                elems.append(nxt)
            elif self.peek() == "-":
                self.i += 1
                rel = self.relationship()
                self.expect("->")
                nxt = self.node()
                elems.append(rel)
                elems.append(nxt)
            else:
                raise TckValueError(f"bad path at {self.s[self.i:self.i+20]!r}")


def parse_value(text: str) -> Any:
    p = _Parser(text.strip())
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise TckValueError(f"trailing input in value literal: {text!r}")
    return canon(v)


def parse_plain_value(text: str) -> Any:
    """Parse a TCK literal into PLAIN Python values (lists stay lists,
    maps stay dicts) — the form query parameters need; element/path
    literals are not valid parameter values."""
    p = _Parser(text.strip())
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise TckValueError(f"trailing input in value literal: {text!r}")
    return v


def canon(v: Any, list_order_insensitive: bool = False) -> Any:
    """Canonical comparable form: dicts -> sorted item tuples, lists ->
    tuples, floats -> rounded; optionally order-insensitive lists."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, dict):
        return (
            "m",
            tuple(sorted((k, canon(x, list_order_insensitive)) for k, x in v.items())),
        )
    if isinstance(v, (list, tuple)):
        if v and isinstance(v, tuple) and v[0] in ("node", "rel", "rel_rev", "path", "m", "f", "l"):
            return v  # already canonical
        items = tuple(canon(x, list_order_insensitive) for x in v)
        if list_order_insensitive:
            items = tuple(sorted(items, key=repr))
        return ("l", items)
    return v


def canon_engine_value(v: Any, list_order_insensitive: bool = False) -> Any:
    """Canonicalize a value coming out of the engine (Row.asDict output).

    Node structs ``{id, labels, **props}`` and relationship structs
    ``{id, src, dst, type, **props}`` fold to the id-less canonical element
    shapes ``parse_value`` produces for TCK literals."""
    if isinstance(v, dict):
        keys = set(v)
        if "__path" in keys:
            # engine path struct {nodes, rels, dirs, __path} -> the TCK
            # path form: nodes interleaved with rel / rel_rev elements
            nodes = [canon_engine_value(n) for n in (v.get("nodes") or [])]
            rels = [canon_engine_value(r) for r in (v.get("rels") or [])]
            dirs = list(v.get("dirs") or [])
            elems = [nodes[0]] if nodes else []
            for i, r in enumerate(rels):
                elems.append(r if dirs[i] else ("rel_rev",) + r[1:])
                elems.append(nodes[i + 1])
            return ("path", tuple(elems))
        if {"id", "labels"} <= keys:
            props = {
                k: x for k, x in v.items() if k not in ("id", "labels") and x is not None
            }
            return ("node", frozenset(v["labels"] or []), canon(props))
        if {"id", "src", "dst", "type"} <= keys:
            props = {
                k: x
                for k, x in v.items()
                if k not in ("id", "src", "dst", "type") and x is not None
            }
            return ("rel", v["type"], canon(props))
        return canon(v, list_order_insensitive)
    if isinstance(v, list):
        return canon(
            [canon_engine_value(x, list_order_insensitive) for x in v],
            list_order_insensitive,
        )
    return canon(v, list_order_insensitive)
