"""Expression acceptance tests (reference: ExpressionTests, NullTests,
FunctionTests, TemporalTests — morpheus-testing acceptance suites)."""

import math

import pytest


@pytest.fixture(scope="module")
def g(session, spark):
    nodes = {
        "N": spark.createDataFrame(
            [
                (0, 1, 1.5, "Alpha", True, ["a", "b", "c"], None),
                (1, -2, 2.5, "beta", False, [], 7),
                (2, None, None, None, None, None, None),
            ],
            "id long, i long, f double, s string, b boolean, l array<string>, opt long",
        )
    }
    return session.read_from(nodes, {})


def one(g, expr, **params):
    q = f"MATCH (n:N) WHERE id(n) = 0 RETURN {expr} AS v"
    return g.cypher(q, params or None).to_maps()[0]["v"]


def rows(g, query, **params):
    return g.cypher(query, params or None).to_maps()


# -- arithmetic ---------------------------------------------------------------

def test_arithmetic(g):
    assert one(g, "1 + 2 * 3") == 7
    assert one(g, "7 / 2") == 3  # integer division
    assert one(g, "7.0 / 2") == 3.5
    assert one(g, "7 % 3") == 1
    assert one(g, "2 ^ 10") == 1024.0
    assert one(g, "-(3 - 5)") == 2


def test_string_concat_plus(g):
    assert one(g, "'a' + 'b'") == "ab"
    assert one(g, "'a' + 1") == "a1"
    assert one(g, "n.s + '!'") == "Alpha!"


def test_list_concat_plus(g):
    assert one(g, "[1, 2] + [3]") == [1, 2, 3]
    assert one(g, "[1, 2] + 3") == [1, 2, 3]


# -- null semantics --------------------------------------------------------------

def test_null_propagation(g):
    assert one(g, "null + 1") is None
    assert one(g, "1 < null") is None
    assert one(g, "null = null") is None
    assert one(g, "null IS NULL") is True
    assert one(g, "NOT null") is None


def test_ternary_logic(g):
    assert one(g, "true OR null") is True
    assert one(g, "false OR null") is None
    assert one(g, "true AND null") is None
    assert one(g, "false AND null") is False


def test_missing_property_is_null(g):
    out = rows(g, "MATCH (n:N) RETURN n.nonexistent AS v")
    assert all(m["v"] is None for m in out)


def test_coalesce(g):
    out = rows(g, "MATCH (n:N) RETURN coalesce(n.opt, n.i, -1) AS v ORDER BY id(n)")
    assert [m["v"] for m in out] == [1, 7, -1]


# -- comparisons / predicates -------------------------------------------------------

def test_string_predicates(g):
    assert one(g, "n.s STARTS WITH 'Al'") is True
    assert one(g, "n.s ENDS WITH 'ha'") is True
    assert one(g, "n.s CONTAINS 'lph'") is True
    assert one(g, "n.s =~ 'Al.*'") is True
    assert one(g, "n.s =~ 'al.*'") is False


def test_in_and_case(g):
    assert one(g, "1 IN [1, 2]") is True
    assert one(g, "3 IN [1, 2]") is False
    assert one(g, "CASE n.i WHEN 1 THEN 'one' ELSE 'other' END") == "one"
    assert one(g, "CASE WHEN n.i > 0 THEN 'pos' WHEN n.i < 0 THEN 'neg' END") == "pos"


# -- lists -----------------------------------------------------------------------

def test_list_operations(g):
    assert one(g, "n.l[0]") == "a"
    assert one(g, "n.l[-1]") == "c"  # negative index counts from the end
    assert one(g, "n.l[-3]") == "a"
    assert one(g, "n.l[-4]") is None  # past the front: null
    assert one(g, "n.l[5]") is None
    assert one(g, "n.l[1..3]") == ["b", "c"]
    assert one(g, "n.l[..2]") == ["a", "b"]
    assert one(g, "size(n.l)") == 3
    assert one(g, "head(n.l)") == "a"
    assert one(g, "last(n.l)") == "c"
    assert one(g, "tail(n.l)") == ["b", "c"]
    assert one(g, "reverse(n.l)") == ["c", "b", "a"]
    assert one(g, "range(1, 4)") == [1, 2, 3, 4]
    assert one(g, "range(0, 10, 5)") == [0, 5, 10]


def test_list_hofs(g):
    assert one(g, "[x IN range(1,5) WHERE x % 2 = 0]") == [2, 4]
    assert one(g, "[x IN range(1,3) | x * x]") == [1, 4, 9]
    assert one(g, "any(x IN [1,2] WHERE x > 1)") is True
    assert one(g, "all(x IN [1,2] WHERE x > 1)") is False
    assert one(g, "none(x IN [1,2] WHERE x > 5)") is True
    assert one(g, "single(x IN [1,2,3] WHERE x = 2)") is True
    assert one(g, "reduce(acc = 0, x IN [1,2,3] | acc + x)") == 6


# -- scalar functions -----------------------------------------------------------------

def test_string_functions(g):
    assert one(g, "toUpper('ab')") == "AB"
    assert one(g, "toLower('AB')") == "ab"
    assert one(g, "trim('  x  ')") == "x"
    assert one(g, "ltrim('  x')") == "x"
    assert one(g, "rtrim('x  ')") == "x"
    assert one(g, "reverse('abc')") == "cba"
    assert one(g, "replace('abcabc', 'b', 'X')") == "aXcaXc"
    assert one(g, "substring('hello', 1, 3)") == "ell"
    assert one(g, "substring('hello', 1)") == "ello"
    assert one(g, "split('a,b,c', ',')") == ["a", "b", "c"]
    assert one(g, "left('hello', 2)") == "he"
    assert one(g, "right('hello', 2)") == "lo"
    assert one(g, "size('hello')") == 5
    assert one(g, "toString(42)") == "42"


def test_math_functions(g):
    assert one(g, "abs(-3)") == 3
    assert one(g, "ceil(1.2)") == 2.0
    assert one(g, "floor(1.8)") == 1.0
    assert one(g, "round(1.5)") == 2.0
    assert one(g, "sign(-42)") == -1
    assert one(g, "sqrt(16.0)") == 4.0
    assert abs(one(g, "exp(1.0)") - math.e) < 1e-12
    assert abs(one(g, "log(e())") - 1.0) < 1e-12
    assert one(g, "log10(100.0)") == 2.0
    assert abs(one(g, "pi()") - math.pi) < 1e-15
    assert one(g, "toInteger('42')") == 42
    assert one(g, "toFloat('1.5')") == 1.5
    assert one(g, "toBoolean('true')") is True
    assert one(g, "toBoolean('FALSE')") is False
    # Cypher: non-boolean strings convert to null (Spark's cast would
    # accept 'yes'/'y'/'1')
    assert one(g, "toBoolean('yes')") is None
    assert one(g, "toBoolean('1')") is None


def test_trig_functions(g):
    assert abs(one(g, "sin(0.0)")) < 1e-12
    assert abs(one(g, "cos(0.0)") - 1) < 1e-12
    assert abs(one(g, "atan2(1.0, 1.0)") - math.pi / 4) < 1e-12
    assert abs(one(g, "degrees(pi())") - 180.0) < 1e-9
    assert abs(one(g, "radians(180.0)") - math.pi) < 1e-12
    assert abs(one(g, "cot(pi()/4)") - 1.0) < 1e-9
    assert abs(one(g, "haversin(pi())") - 1.0) < 1e-12


def test_temporal(g):
    assert str(one(g, "date('2024-03-01')")) == "2024-03-01"
    assert str(one(g, "localdatetime('2024-03-01T12:30:00')")) == "2024-03-01 12:30:00"
    assert str(one(g, "date('2024-03-01') + duration({days: 2})")) == "2024-03-03"
    assert one(g, "timestamp()") > 1.7e12  # epoch millis


def test_keys_and_properties(g):
    ks = one(g, "keys(n)")
    assert sorted(ks) == ["b", "f", "i", "l", "s"]  # opt is null on node 0
    props = one(g, "properties(n)")
    assert props["i"] == 1 and props["s"] == "Alpha"


def test_xor(g):
    assert one(g, "true XOR false") is True
    assert one(g, "true XOR true") is False


def test_aggregates_stats(g):
    out = rows(
        g,
        "MATCH (n:N) RETURN stDev(n.f) AS sd, stDevP(n.f) AS sdp, "
        "percentileCont(n.f, 0.5) AS pc, percentileDisc(n.f, 0.5) AS pd",
    )[0]
    assert abs(out["sd"] - 0.7071067811865476) < 1e-12
    assert abs(out["sdp"] - 0.5) < 1e-12
    assert out["pc"] == 2.0
    assert out["pd"] == 1.5
    out2 = rows(g, "MATCH (n:N) RETURN collect(n.i) AS xs")[0]
    assert sorted(out2["xs"]) == [-2, 1]


def test_duration_aggregates(g):
    """Duration sum/avg/min/max (the reference needs custom UDAFs,
    TemporalUdafs.scala:50-116; ANSI day-time intervals aggregate natively)."""
    out = rows(
        g,
        "UNWIND [1, 2, 3] AS d WITH duration({hours: d}) AS dur "
        "RETURN sum(dur) AS s, avg(dur) AS a, min(dur) AS mn, max(dur) AS mx",
    )[0]
    import datetime

    assert out["s"] == datetime.timedelta(hours=6)
    assert out["a"] == datetime.timedelta(hours=2)
    assert out["mn"] == datetime.timedelta(hours=1)
    assert out["mx"] == datetime.timedelta(hours=3)


def test_bigdecimal(g):
    from decimal import Decimal

    assert one(g, "bigdecimal(1.5, 10, 2)") == Decimal("1.50")
    assert one(g, "bigdecimal(n.i, 12, 3) + bigdecimal(1, 5, 1)") == Decimal("2.000")


def test_map_projection(g):
    out = rows(g, "MATCH (n:N) WHERE id(n) = 0 RETURN n {.s, .i, double_i: n.i * 2} AS m")[0]["m"]
    assert out == {"s": "Alpha", "i": 1, "double_i": 2}
    out2 = rows(g, "MATCH (n:N) WHERE id(n) = 0 RETURN n {.*} AS m")[0]["m"]
    assert out2["s"] == "Alpha" and "f" in out2 and "l" in out2


def test_parameters_types(g):
    assert one(g, "$p", p=5) == 5
    assert one(g, "$p", p="x") == "x"
    assert one(g, "$p", p=[1, 2]) == [1, 2]
    assert one(g, "n.i = $p", p=1) is True
