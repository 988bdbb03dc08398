"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a Cypher query through the engine in
``cypher_for_apache_spark_spark/`` over the TPC-H-ish property graph
mapping (``sources/tpch.py``), or a table-level pipeline operator; each
``oracle_sql()`` entry is the equivalent ANSI SQL for DuckDB on the raw
parquet tables.

Numeric-determinism convention: double sums that would be order-dependent
are computed in integer cents (``sum(toInteger(round(x * 100)))``) on BOTH
sides so Spark and DuckDB produce bit-identical results regardless of
partitioning/aggregation order. DuckDB integer SUM returns HUGEINT, so
oracles cast back to BIGINT.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_GRAPH_CACHE: dict = {}


def _session(spark: SparkSession):
    from cypher_for_apache_spark_spark import CypherSession

    return CypherSession(spark)


def _graph(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        from cypher_for_apache_spark_spark.sources.tpch import load_tpch_graph

        g = load_tpch_graph(spark, sf_dir)
        g._session = _session(spark)
        _GRAPH_CACHE[key] = g
    return _GRAPH_CACHE[key]


def _cypher(query: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _graph(spark, sf_dir).cypher(query).df

    run.__doc__ = query
    return run


# ---------------------------------------------------------------------------
# Cypher queries over the TPC-H graph, with DuckDB oracles.
# ---------------------------------------------------------------------------

_CYPHER_QUERIES: dict[str, tuple[str, str]] = {
    # -- scans / filters / projections --------------------------------------
    "scan_filter_project": (
        """MATCH (c:Customer) WHERE c.acctbal > 3000.0
           RETURN c.name AS name, c.acctbal AS acctbal""",
        """SELECT c_name AS name, c_acctbal AS acctbal
           FROM customer WHERE c_acctbal > 3000.0""",
    ),
    # -- expand (pattern join) + implicit grouping --------------------------
    "expand_group_count": (
        """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
           RETURN n.name AS nation, count(*) AS customers""",
        """SELECT n_name AS nation, count(*) AS customers
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name""",
    ),
    "two_hop_region": (
        """MATCH (c:Customer)-[:IN_NATION]->(:Nation)-[:IN_REGION]->(r:Region)
           RETURN r.name AS region, count(*) AS customers""",
        """SELECT r_name AS region, count(*) AS customers
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name""",
    ),
    "shared_node_join": (
        """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)<-[:IN_NATION]-(s:Supplier)
           RETURN n.name AS nation, count(*) AS pairs""",
        """SELECT n_name AS nation, count(*) AS pairs
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN supplier ON s_nationkey = n_nationkey
           GROUP BY n_name""",
    ),
    # -- rel-property aggregation (TPC-H Q1 shape) ---------------------------
    "pricing_summary": (
        """MATCH (:Order)-[l:LINE]->(:Part)
           WHERE l.shipdate <= localdatetime('1998-09-02T00:00:00')
           RETURN l.returnflag AS returnflag, l.linestatus AS linestatus,
                  sum(l.quantity) AS sum_qty,
                  sum(toInteger(round(l.extendedprice * 100))) AS sum_base_cents,
                  sum(toInteger(round(l.extendedprice * (1 - l.discount) * 100))) AS sum_disc_cents,
                  count(*) AS count_order""",
        """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
                  SUM(l_quantity) AS sum_qty,
                  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                  count(*) AS count_order
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           GROUP BY l_returnflag, l_linestatus""",
    ),
    # -- OPTIONAL MATCH -------------------------------------------------------
    "optional_match_histogram": (
        """MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
           WITH c, count(o) AS n_orders
           RETURN n_orders, count(*) AS customers""",
        """SELECT n_orders, count(*) AS customers FROM (
             SELECT c_custkey, count(o_orderkey) AS n_orders
             FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             GROUP BY c_custkey)
           GROUP BY n_orders""",
    ),
    # -- EXISTS / NOT EXISTS pattern predicates -------------------------------
    "exists_pattern": (
        """MATCH (c:Customer)
           WHERE exists((c)-[:PLACED]->(:Order {status: 'F'}))
           RETURN count(*) AS customers_with_f_order""",
        """SELECT count(*) AS customers_with_f_order FROM customer
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    ),
    "anti_pattern": (
        """MATCH (s:Supplier)
           WHERE NOT EXISTS { MATCH (s)-[:SUPPLIES]->(p2:Part {brand: 'Brand#4'})
                              WHERE p2.size > 45 }
           RETURN s.name AS name""",
        """SELECT s_name AS name FROM supplier
           WHERE NOT EXISTS (
             SELECT 1 FROM lineitem JOIN part ON p_partkey = l_partkey
             WHERE l_suppkey = s_suppkey AND p_brand = 'Brand#4' AND p_size > 45)""",
    ),
    # -- UNION / DISTINCT / ORDER / SKIP / LIMIT ------------------------------
    "union_names": (
        """MATCH (n:Nation) RETURN n.name AS name
           UNION MATCH (r:Region) RETURN r.name AS name""",
        """SELECT n_name AS name FROM nation
           UNION SELECT r_name AS name FROM region""",
    ),
    "distinct_segments": (
        """MATCH (c:Customer) RETURN DISTINCT c.mktsegment AS segment ORDER BY segment""",
        """SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment""",
    ),
    "order_skip_limit": (
        """MATCH (c:Customer) RETURN c.name AS name, c.acctbal AS acctbal
           ORDER BY acctbal DESC, name SKIP 5 LIMIT 10""",
        """SELECT c_name AS name, c_acctbal AS acctbal FROM customer
           ORDER BY acctbal DESC, name LIMIT 10 OFFSET 5""",
    ),
    # -- UNWIND ---------------------------------------------------------------
    "unwind_words": (
        """MATCH (p:Part) UNWIND split(p.type, ' ') AS word
           RETURN word, count(*) AS c""",
        """SELECT word, count(*) AS c FROM (
             SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
           GROUP BY word""",
    ),
    # -- CASE -------------------------------------------------------------------
    "case_buckets": (
        """MATCH (c:Customer)
           RETURN CASE WHEN c.acctbal < 0.0 THEN 'neg'
                       WHEN c.acctbal < 5000.0 THEN 'mid'
                       ELSE 'high' END AS bucket, count(*) AS c""",
        """SELECT CASE WHEN c_acctbal < 0.0 THEN 'neg'
                       WHEN c_acctbal < 5000.0 THEN 'mid'
                       ELSE 'high' END AS bucket, count(*) AS c
           FROM customer GROUP BY 1""",
    ),
    # -- var-length expand ------------------------------------------------------
    "varlength_chain": (
        """MATCH (a:Order)-[rs:NEXT*1..2]->(b:Order)
           RETURN size(rs) AS hops, count(*) AS c""",
        """WITH seq AS (
             SELECT o_orderkey, o_custkey,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS rn
             FROM orders),
           e AS (
             SELECT a.o_orderkey AS s, b.o_orderkey AS t
             FROM seq a JOIN seq b
               ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1)
           SELECT hops, count(*) AS c FROM (
             SELECT CAST(1 AS BIGINT) AS hops FROM e
             UNION ALL
             SELECT CAST(2 AS BIGINT) AS hops FROM e a JOIN e b ON a.t = b.s)
           GROUP BY hops""",
    ),
    # -- scalar functions --------------------------------------------------------
    "string_funcs": (
        """MATCH (n:Nation)
           RETURN toLower(n.name) AS lname, substring(n.name, 0, 3) AS pre,
                  size(n.name) AS len""",
        """SELECT lower(n_name) AS lname, substr(n_name, 1, 3) AS pre,
                  CAST(length(n_name) AS BIGINT) AS len
           FROM nation""",
    ),
    "in_list_filter": (
        """MATCH (n:Nation) WHERE n.name IN ['NATION_1', 'NATION_2', 'NATION_3']
           RETURN n.name AS name""",
        """SELECT n_name AS name FROM nation
           WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')""",
    ),
    # -- aggregates ----------------------------------------------------------------
    "agg_stats": (
        """MATCH (s:Supplier)
           RETURN min(s.acctbal) AS mn, max(s.acctbal) AS mx,
                  count(DISTINCT s.name) AS names""",
        """SELECT min(s_acctbal) AS mn, max(s_acctbal) AS mx,
                  count(DISTINCT s_name) AS names
           FROM supplier""",
    ),
    "percentile_disc_by_segment": (
        """MATCH (c:Customer)
           RETURN c.mktsegment AS segment, percentileDisc(c.acctbal, 0.5) AS median_bal""",
        """WITH ranked AS (
             SELECT c_mktsegment AS segment, c_acctbal AS v,
                    cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
             FROM customer)
           SELECT segment, min(v) AS median_bal FROM ranked WHERE cd >= 0.5
           GROUP BY segment""",
    ),
    "with_chain_filter": (
        """MATCH (o:Order) WITH o.status AS status, o.totalprice AS tp
           WHERE tp > 100000.0
           RETURN status, count(*) AS c, sum(toInteger(round(tp))) AS total_rounded""",
        """SELECT o_orderstatus AS status, count(*) AS c,
                  CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS total_rounded
           FROM orders WHERE o_totalprice > 100000.0
           GROUP BY o_orderstatus""",
    ),
    # -- list expressions / quantifiers ----------------------------------------------
    "list_ops": (
        """UNWIND [[1, 2, 3], [2, 4], [5]] AS l
           RETURN size([x IN l WHERE x % 2 = 0]) AS evens,
                  any(x IN l WHERE x > 4) AS has_big""",
        """SELECT CAST(1 AS BIGINT) AS evens, false AS has_big
           UNION ALL SELECT CAST(2 AS BIGINT), false
           UNION ALL SELECT CAST(0 AS BIGINT), true""",
    ),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    g = _graph(spark, "/root/testdata/sf0.001")
    return g.cypher(
        """MATCH (c:Customer)-[:IN_NATION]->(:Nation)-[:IN_REGION]->(r:Region)
           RETURN r.name AS region, count(*) AS customers
           ORDER BY customers DESC, region"""
    ).df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (cypher, _sql) in _CYPHER_QUERIES.items():
        out[name] = _cypher(cypher)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_cy, sql) in _CYPHER_QUERIES.items()}
