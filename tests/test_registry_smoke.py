"""Every queries() entry must plan and execute at sf0.001, and every
oracle_sql() entry must be runnable DuckDB SQL.

This is the guard against the round-2 failure class: a registry entry that
errors only under the driver harness (e.g. a dtype the local tests never
produced) truncates the correctness file for every entry after it. Running
the full registry here — plan + a bounded action per query — surfaces that
in pytest instead.
"""

import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_every_query_runs(spark):
    failures = []
    for name, fn in E.queries().items():
        try:
            df = fn(spark, SF_DIR)
            df.limit(5).collect()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_every_oracle_is_valid_sql():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = E.queries()
    failures = []
    for name, sql in E.oracle_sql().items():
        if name not in qs:
            failures.append(f"{name}: oracle without a queries() entry")
            continue
        try:
            con.execute(sql).fetchmany(5)
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


def test_entry_contract(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema == E.entry(spark).schema
