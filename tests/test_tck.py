"""TCK-style acceptance suite: Gherkin-subset features under tests/tck/,
run through the engine via the CREATE-statement graph factory, with the
reference's blacklist discipline (morpheus-tck failing_blacklist:3-7 — a
blacklisted scenario that *starts passing* is itself a failure)."""

import glob
import os

import pytest

from cypher_for_apache_spark_spark.tck import parse_feature, run_scenario

FEATURE_DIR = os.path.join(os.path.dirname(__file__), "tck")

# scenarios expected to FAIL (unsupported by design, like the reference):
BLACKLIST = {
    "Blacklisted::Return a whole path value",
    "Blacklisted::shortestPath is unsupported",
}


def _scenarios():
    out = []
    for path in sorted(glob.glob(os.path.join(FEATURE_DIR, "*.feature"))):
        out.extend(parse_feature(open(path).read()))
    return out

SCENARIOS = _scenarios()


@pytest.fixture(scope="module")
def tck_session(spark):
    from cypher_for_apache_spark_spark import CypherSession

    return CypherSession(spark)


@pytest.mark.parametrize(
    "scenario",
    [s for s in SCENARIOS if s.key not in BLACKLIST],
    ids=lambda s: s.key,
)
def test_tck_scenario(tck_session, spark, scenario):
    run_scenario(tck_session, spark, scenario)


@pytest.mark.parametrize(
    "scenario",
    [s for s in SCENARIOS if s.key in BLACKLIST],
    ids=lambda s: s.key,
)
def test_tck_blacklisted_still_fails(tck_session, spark, scenario):
    with pytest.raises(Exception):
        run_scenario(tck_session, spark, scenario)


def test_blacklist_names_exist():
    keys = {s.key for s in SCENARIOS}
    assert BLACKLIST <= keys, f"stale blacklist entries: {BLACKLIST - keys}"
