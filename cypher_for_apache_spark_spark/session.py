"""CypherSession: the user-facing entry point.

Mirrors the reference's MorpheusSession / RelationalCypherSession surface
(morpheus-spark-cypher/.../api/MorpheusSession.scala:77-110,
okapi-relational/.../api/graph/RelationalCypherSession.scala:130-199):
``read_from`` builds a ScanGraph from DataFrames, ``cypher`` parses, plans
and lazily returns records; a catalog maps graph names to graphs.
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Optional, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from cypher_for_apache_spark_spark.graph import NodeTable, PropertyGraph, RelationshipTable
from cypher_for_apache_spark_spark.parser import parse
from cypher_for_apache_spark_spark.plans.planner import Planner


class CypherResult:
    """Lazy query result (reference: MorpheusRecords,
    morpheus-spark-cypher/.../impl/MorpheusRecords.scala:91-138). Nothing
    executes until a Spark action touches ``df``. Multiple-graph queries
    (RETURN GRAPH) expose ``graph`` instead."""

    def __init__(self, df: Optional[DataFrame] = None, graph=None):
        self.df = df
        self.graph = graph

    def collect(self):
        return self.df.collect()

    def to_maps(self):
        """Bag-of-dicts view used by the acceptance tests (reference result
        comparison convention, SURVEY.md §5)."""
        return [row.asDict(recursive=True) for row in self.df.collect()]

    def show(self, n: int = 20, truncate=False):
        self.df.show(n, truncate=truncate)

    def explain(self, mode: str = "formatted") -> str:
        """Physical-plan text for the compiled query (reference:
        PrintRelationalPlan / MorpheusRecords plan output). Useful for
        asserting what actually reaches the scan — PushedFilters,
        ReadSchema pruning, join strategies, WholeStageCodegen spans.

        ``mode``: any Spark explain mode (simple/extended/codegen/cost/
        formatted) or "physical" for the raw executed-plan tree."""
        if mode == "physical":
            return self.df._jdf.queryExecution().executedPlan().toString()
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.df.explain(mode=mode)
        return buf.getvalue()


def build_spark_session(
    master: Optional[str] = None,
    app_name: str = "cypher-spark",
    extra_confs: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    """Build a SparkSession with the static configuration this library's
    workloads want. ``CypherSession`` accepts any session, but STATIC confs
    cannot be set after the session exists — use this builder (or copy its
    confs) so product sessions get them too, not just the bench harness.

    - ``spark.python.sql.dataFrameDebugging.enabled=false``: PySpark 4's
      DataFrame-debugging wrapper pays ~3 py4j round trips per DataFrame
      API call (getActiveSession + conf.get + origin set/clear) purely to
      enrich error messages with the Python call site. Cypher plan building
      is driver-side Python over thousands of DataFrame/Column calls;
      measured 3x faster plan builds with it off (5080 -> 1880 py4j calls
      per 10 plans). Physical plans are bit-identical — the only loss is
      error-message call-site enrichment.

    Runtime confs (ANSI off, cross joins, AQE) are applied here too, but
    those are also re-applied per-session by ``CypherSession``.
    """
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b.config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
    )
    for k, v in (extra_confs or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def _spark_tuning(spark: SparkSession) -> None:
    """Session-level settings Cypher semantics rely on. All are
    runtime-settable SQL confs."""
    try:
        # Cypher ternary logic wants null-on-error, not ANSI errors
        spark.conf.set("spark.sql.ansi.enabled", "false")
        # OPTIONAL MATCH with disjoint patterns needs cross joins (reference:
        # MorpheusSession.scala:104 sets spark.sql.crossJoin.enabled)
        spark.conf.set("spark.sql.crossJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass


class CypherSession:
    def __init__(
        self,
        spark: SparkSession,
        expand_salt_factor: int = 0,
        expand_salt_auto_min_bytes: int = 64 << 20,
    ):
        """``expand_salt_factor``: skew salting for pattern expands on
        supernode-heavy graphs (hub nodes whose degree pins one reducer).
        0 (default) = AUTO — rel frames whose Catalyst size estimate
        exceeds ``expand_salt_auto_min_bytes`` get a one-off bounded
        degree-skew sniff (memoized per graph/type/direction), and expands
        over a dominant hub are salted automatically; 1 = off; N>1 forces
        spreading each hot node's relationship rows over N reducers
        (operators/skew.py rationale). The salted result is plan-asserted
        equal to the unsalted expand in tests."""
        self.spark = spark
        _spark_tuning(spark)
        self.catalog: Dict[str, PropertyGraph] = {}
        self.views: Dict[str, tuple] = {}  # name -> (params, query AST)
        self.expand_salt_factor = expand_salt_factor
        self.expand_salt_auto_min_bytes = expand_salt_auto_min_bytes
        from cypher_for_apache_spark_spark.procedures import ProcedureRegistry

        self.procedures = ProcedureRegistry()

    def register_procedure(self, name: str, fn, returns) -> None:
        """Register a user procedure for ``CALL name(args) YIELD cols``:
        ``fn(ctx, *args) -> DataFrame`` producing at least the ``returns``
        columns (procedures.py — the GDS-style extension point the
        reference lacks)."""
        self.procedures.register(name, fn, returns)

    # -- graph ingestion ----------------------------------------------------
    def read_from(
        self,
        nodes: Mapping[Union[str, tuple, frozenset], DataFrame],
        relationships: Optional[Mapping[str, DataFrame]] = None,
        node_id: str = "id",
        rel_id: str = "id",
        rel_src: str = "src",
        rel_dst: str = "dst",
        name: str = "graph",
    ) -> PropertyGraph:
        """Build a property graph from DataFrames.

        ``nodes``: {label or label-tuple -> DataFrame with an id column +
        property columns}; ``relationships``: {type -> DataFrame with id,
        src, dst + property columns}. Ints are lifted to long automatically.
        """
        node_tables = []
        for labels, df in nodes.items():
            if isinstance(labels, str):
                labels = (labels,)
            node_tables.append(NodeTable.create(labels, df, id_col=node_id))
        rel_tables = []
        for rel_type, df in (relationships or {}).items():
            rel_tables.append(
                RelationshipTable.create(rel_type, df, id_col=rel_id, src_col=rel_src, dst_col=rel_dst)
            )
        g = PropertyGraph(node_tables, rel_tables, name=name)
        g._session = self
        return g

    def create_graphs_from_ddl(
        self,
        ddl: str,
        tables=None,
        register: bool = True,
    ) -> Dict[str, PropertyGraph]:
        """Run Graph DDL text (CREATE GRAPH [TYPE] ... / SET SCHEMA ...) and
        return {graph name -> PropertyGraph} (reference: graph-ddl module +
        SQL PGDS, backend-sql-graphddl.adoc). ``tables`` is a {name ->
        DataFrame} dict or None to resolve views through this session's
        Spark catalog; with ``register`` each graph lands in the session
        catalog for FROM GRAPH queries."""
        from cypher_for_apache_spark_spark.sources.graph_ddl import (
            build_graph,
            parse_ddl,
        )

        doc = parse_ddl(ddl)
        out: Dict[str, PropertyGraph] = {}
        for name in doc.graphs:
            g = build_graph(doc, name, tables if tables is not None else self.spark)
            g._session = self
            if register:
                self.catalog[name] = g
            out[name] = g
        return out

    def store_graph(self, name: str, graph: PropertyGraph) -> None:
        graph._session = self
        self.catalog[name] = graph

    def graph(self, name: str) -> PropertyGraph:
        return self.catalog[name]

    # -- query --------------------------------------------------------------
    def cypher(
        self,
        query: str,
        parameters: Optional[dict] = None,
        graph: Optional[PropertyGraph] = None,
        graph_name: Optional[str] = None,
        driving_table: Optional[DataFrame] = None,
    ) -> CypherResult:
        if graph is None and graph_name is not None:
            graph = self.catalog[graph_name]
        if graph is None and len(self.catalog) == 1:
            graph = next(iter(self.catalog.values()))
        return self.cypher_on_graph(graph, query, parameters or {}, driving_table)

    def cypher_on_graph(
        self,
        graph: Optional[PropertyGraph],
        query: str,
        parameters: dict,
        driving_table: Optional[DataFrame] = None,
    ) -> CypherResult:
        ast = parse(query)
        planner = Planner(
            self.spark,
            graph,
            parameters,
            catalog=self.catalog,
            driving_table=driving_table,
            views=self.views,
            expand_salt_factor=self.expand_salt_factor,
            expand_salt_auto_min_bytes=self.expand_salt_auto_min_bytes,
            procedures=self.procedures,
        )
        result = planner.plan(ast)
        if result.graph is not None:
            result.graph._session = self
            return CypherResult(graph=result.graph)
        return CypherResult(df=result.df)

    # -- SQL passthrough (reference: MorpheusSession.sql,
    #    MorpheusSession.scala:84-85) ----------------------------------------
    def sql(self, query: str) -> CypherResult:
        return CypherResult(self.spark.sql(query))
