"""TCK acceptance suite in the official openCypher TCK format.

Runs two corpora through the same runner:

1. the in-repo corpus under tests/tck/ (always);
2. the official openCypher TCK artifact, when a checkout is supplied via
   ``OPENCYPHER_TCK_DIR`` (the artifact is not redistributable inside
   this repo and the build environment has no network access, so the
   official corpus is opt-in — point the env var at an unpacked
   openCypher/tck directory and the full corpus runs with the same
   blacklist discipline).

Blacklist discipline mirrors the reference
(morpheus-tck/.../TckSparkCypherTest.scala:58-83 with
resources/failing_blacklist): non-blacklisted scenarios must pass;
blacklisted scenarios are EXECUTED and must still fail — a blacklisted
scenario that starts passing is itself an error, so the blacklist can
never go stale. Scenarios whose expectations require graph mutation
(nonzero side-effects table) are auto-classified wont-fix for this
read-only engine, mirroring the reference's wont_fix_blacklist.
"""

import glob
import os

import pytest

from cypher_for_apache_spark_spark.tck import parse_feature, run_scenario
from cypher_for_apache_spark_spark.tck.runner import (
    load_blacklist,
    load_tck_directory,
)

FEATURE_DIR = os.path.join(os.path.dirname(__file__), "tck")
OFFICIAL_DIR = os.environ.get("OPENCYPHER_TCK_DIR")

BLACKLIST = load_blacklist(os.path.join(FEATURE_DIR, "blacklist"))
_official_blacklist_path = os.path.join(FEATURE_DIR, "official_blacklist")
if os.path.exists(_official_blacklist_path):
    BLACKLIST |= load_blacklist(_official_blacklist_path)


def _scenarios():
    out = []
    for path in sorted(glob.glob(os.path.join(FEATURE_DIR, "*.feature"))):
        out.extend(parse_feature(open(path).read()))
    if OFFICIAL_DIR:
        out.extend(load_tck_directory(OFFICIAL_DIR))
    return out


SCENARIOS = _scenarios()
WHITELIST = [s for s in SCENARIOS if s.key not in BLACKLIST and not s.writes]
BLACKLISTED = [s for s in SCENARIOS if s.key in BLACKLIST]
WONT_FIX = [s for s in SCENARIOS if s.writes and s.key not in BLACKLIST]


@pytest.fixture(scope="module")
def tck_session(spark):
    from cypher_for_apache_spark_spark import CypherSession

    return CypherSession(spark)


@pytest.mark.parametrize("scenario", WHITELIST, ids=lambda s: s.key)
def test_tck_scenario(tck_session, spark, scenario):
    run_scenario(tck_session, spark, scenario, tck_root=OFFICIAL_DIR)


# ids via getattr: with an EMPTY blacklist pytest probes the id function
# on its internal empty-set sentinel, which has no .key
@pytest.mark.parametrize(
    "scenario", BLACKLISTED, ids=lambda s: getattr(s, "key", "empty")
)
def test_tck_blacklisted_still_fails(tck_session, spark, scenario):
    with pytest.raises(Exception):
        run_scenario(tck_session, spark, scenario, tck_root=OFFICIAL_DIR)


def test_blacklist_names_exist():
    keys = {s.key for s in SCENARIOS}
    stale = {k for k in BLACKLIST if k not in keys}
    assert not stale, f"stale blacklist entries: {stale}"


def test_wont_fix_scenarios_are_writes_only():
    # read-only engine: every auto-wont-fix scenario must genuinely expect
    # side effects, nothing else lands in the bucket silently
    assert all(s.writes for s in WONT_FIX)
