"""Temporal accessor / duration acceptance tests (reference: TemporalTests,
morpheus-testing acceptance; DateProperty/LocalDateTimeProperty/
DurationProperty Expr.scala:487-503; TemporalUdfs.scala)."""

import datetime

import pytest

from cypher_for_apache_spark_spark.functions.compiler import CypherCompileError


@pytest.fixture(scope="module")
def g(session, spark):
    nodes = {
        "E": spark.createDataFrame(
            [
                (
                    0,
                    datetime.date(2021, 3, 14),
                    datetime.datetime(2021, 3, 14, 9, 30, 15, 250500),
                ),
                (
                    1,
                    datetime.date(2020, 12, 31),
                    datetime.datetime(2020, 12, 31, 23, 59, 59, 999999),
                ),
                (2, None, None),
            ],
            "id long, d date, ts timestamp_ntz",
        )
    }
    return session.read_from(nodes, {})


def one(g, expr, node_id=0):
    q = f"MATCH (e:E) WHERE id(e) = {node_id} RETURN {expr} AS v"
    return g.cypher(q).to_maps()[0]["v"]


# -- date accessors -----------------------------------------------------------

def test_date_accessors(g):
    assert one(g, "e.d.year") == 2021
    assert one(g, "e.d.quarter") == 1
    assert one(g, "e.d.month") == 3
    assert one(g, "e.d.day") == 14
    assert one(g, "e.d.week") == 10
    assert one(g, "e.d.ordinalDay") == 73
    assert one(g, "e.d.dayOfQuarter") == 73
    assert one(g, "e.d.dayOfWeek") == 7  # 2021-03-14 is a Sunday (ISO 7)
    assert one(g, "e.d.weekDay") == 7


def test_week_year_boundary(g):
    # 2020-12-31 is a Thursday in ISO week 53 of week-year 2020
    assert one(g, "e.d.week", 1) == 53
    assert one(g, "e.d.weekYear", 1) == 2020
    assert one(g, "e.d.quarter", 1) == 4
    assert one(g, "e.d.dayOfQuarter", 1) == 92


def test_timestamp_accessors(g):
    assert one(g, "e.ts.year") == 2021
    assert one(g, "e.ts.hour") == 9
    assert one(g, "e.ts.minute") == 30
    assert one(g, "e.ts.second") == 15
    assert one(g, "e.ts.millisecond") == 250
    assert one(g, "e.ts.microsecond") == 250500


def test_temporal_accessor_null_propagation(g):
    assert one(g, "e.d.year", 2) is None
    assert one(g, "e.ts.hour", 2) is None
    assert one(g, "duration.between(e.d, e.ts).days", 2) is None


def test_time_accessor_on_date_rejected(g):
    with pytest.raises(CypherCompileError):
        g.cypher("MATCH (e:E) RETURN e.d.hour AS h")
    with pytest.raises(CypherCompileError):
        g.cypher("MATCH (e:E) RETURN e.d.nonsense AS x")


# -- durations ----------------------------------------------------------------

def test_duration_iso_string(g):
    assert one(g, "duration('P1DT2H30M15.5S').days") == 1
    assert one(g, "duration('P1DT2H30M15.5S').hours") == 2
    assert one(g, "duration('P1DT2H30M15.5S').minutes") == 150
    assert one(g, "duration('P1DT2H30M15.5S').seconds") == 9015
    assert one(g, "duration('P1DT2H30M15.5S').millisecondsOfSecond") == 500
    assert one(g, "duration('P2W').days") == 14
    assert one(g, "duration('P2W').weeks") == 2


def test_duration_negative(g):
    assert one(g, "duration('-P2DT3H').days") == -2
    assert one(g, "duration('-P2DT3H').hours") == -3


def test_duration_map_constructor(g):
    assert one(g, "duration({weeks: 1, days: 1}).days") == 8
    assert one(g, "duration({hours: 26}).days") == 1
    assert one(g, "duration({hours: 26}).hours") == 2
    assert one(g, "duration({seconds: 90}).minutesOfHour") == 1
    assert one(g, "duration({seconds: 90}).secondsOfMinute") == 30
    assert one(g, "duration({milliseconds: 1500}).milliseconds") == 1500


def test_duration_month_components_rejected(g):
    with pytest.raises(CypherCompileError):
        g.cypher("RETURN duration('P1Y') AS d")
    with pytest.raises(CypherCompileError):
        g.cypher("RETURN duration({months: 1}) AS d")
    with pytest.raises(CypherCompileError):
        g.cypher("RETURN duration('garbage') AS d")


def test_duration_month_accessors_zero(g):
    # day-time intervals carry no month component; month-family accessors
    # are 0 (still null-propagating)
    assert one(g, "duration('P400D').months") == 0
    assert one(g, "duration('P400D').years") == 0


def test_duration_between(g):
    assert one(g, "duration.between(e.d, e.ts).hours") == 9
    assert one(g, "duration.between(e.ts, e.d).hours") == -9
    assert (
        one(g, "duration.between(localdatetime('2021-01-01T00:00:00'), "
               "localdatetime('2021-01-31T12:00:00')).days") == 30
    )


def test_duration_arithmetic_with_timestamp(g):
    assert one(g, "(e.ts - duration('P1D')).day") == 13
    assert one(g, "(e.ts + duration('PT30M')).hour") == 10


# -- distinct-aware aggregates -------------------------------------------------

def test_avg_distinct(session, spark):
    nodes = {
        "V": spark.createDataFrame(
            [(0, 10), (1, 10), (2, 40), (3, None)], "id long, v long"
        )
    }
    vg = session.read_from(nodes, {})
    row = vg.cypher(
        "MATCH (n:V) RETURN avg(DISTINCT n.v) AS a, avg(n.v) AS b"
    ).to_maps()[0]
    assert row["a"] == 25.0
    assert row["b"] == 20.0


def test_unsupported_distinct_rejected(session, spark):
    nodes = {"V": spark.createDataFrame([(0, 10)], "id long, v long")}
    vg = session.read_from(nodes, {})
    with pytest.raises(CypherCompileError):
        vg.cypher("MATCH (n:V) RETURN stDev(DISTINCT n.v) AS s")


# -- IN with empty / null lists ------------------------------------------------

def test_in_empty_list(session, spark):
    nodes = {"V": spark.createDataFrame([(0, 10)], "id long, v long")}
    vg = session.read_from(nodes, {})
    row = vg.cypher(
        "MATCH (n:V) RETURN (n.v IN []) AS a, (null IN []) AS b, "
        "(n.v IN [10, 20]) AS c"
    ).to_maps()[0]
    assert row["a"] is False
    assert row["b"] is False
    assert row["c"] is True
    assert vg.cypher("MATCH (n:V) WHERE n.v IN [] RETURN n").to_maps() == []
