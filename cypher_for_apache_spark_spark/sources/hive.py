"""Hive/metastore-backed property-graph source: the reference's
``hiveDatabaseName`` round-trip (FSGraphSource.scala:56-110 registers every
written element table under a Hive database via HiveTableName.scala —
``{db}.{graph}_{node|relationship}_{identifiers}`` — so SQL users can query
graph tables directly and graphs can be rebuilt from the catalog).

This implementation extends the filesystem source: files are written
exactly as FSGraphSource does, then each element table is registered as an
EXTERNAL table (``CREATE TABLE ... USING <fmt> LOCATION <path>``) in the
session catalog. Because Spark lower-cases table identifiers, label sets
and relationship types are NOT recovered from table names; they travel in
``TBLPROPERTIES`` (a deliberate divergence from HiveTableName's
name-mangling, which loses case).

Works against the in-memory session catalog out of the box and against a
real Hive metastore when the session is built with
``enableHiveSupport()`` — the catalog API is identical, only persistence
differs.

Scale notes: registration is metadata-only (no data movement); reads via
``spark.table`` keep full predicate pushdown and partition pruning on the
underlying files.
"""

from __future__ import annotations

import json
import re
from typing import List, Optional

from pyspark.sql import SparkSession

from cypher_for_apache_spark_spark.graph import (
    NodeTable,
    PropertyGraph,
    RelationshipTable,
)
from cypher_for_apache_spark_spark.sources.fs import FSGraphSource, _combo_dirname


def _ident(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", s).lower()


class HiveGraphSource(FSGraphSource):
    """Filesystem graph source that additionally registers every element
    table in a catalog database (the reference's hiveDatabaseName option)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fmt: str = "parquet",
        database: Optional[str] = None,
    ):
        if fmt == "csv":
            # csv writes complex columns as JSON strings (see
            # FSGraphSource._encode_for_write); a catalog table over those
            # files would silently expose strings where lists are expected
            raise ValueError("Hive registration supports parquet/orc/json, not csv")
        super().__init__(spark, root, fmt)
        self.database = database or "graphs"

    # -- naming (HiveTableName.scala semantics, case kept in TBLPROPERTIES) --
    def _node_table_name(self, graph: str, labels) -> str:
        return f"{self.database}.{_ident(graph)}__node__{_ident(_combo_dirname(labels))}"

    def _rel_table_name(self, graph: str, rel_type: str, i: int = 0) -> str:
        suffix = f"__{i}" if i else ""
        return f"{self.database}.{_ident(graph)}__relationship__{_ident(rel_type)}{suffix}"

    # -- store ---------------------------------------------------------------
    def store(self, name: str, graph: PropertyGraph, mode: str = "error") -> None:
        super().store(name, graph, mode=mode)
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.database}")
        import os

        for combo, nt in graph.node_tables.items():
            path = os.path.join(self._graph_dir(name), "nodes", _combo_dirname(combo))
            props = {"kind": "node", "labels": sorted(combo), "graph": name}
            self._register(self._node_table_name(name, combo), path, props)
        for rel_type, rts in graph.rel_tables.items():
            for i, rt in enumerate(rts):
                d = re.sub(r"[^A-Za-z0-9]", "_", rel_type) + (f"__{i}" if i else "")
                path = os.path.join(self._graph_dir(name), "relationships", d)
                props = {
                    "kind": "relationship",
                    "type": rel_type,
                    "graph": name,
                    "src_labels": sorted(rt.src_labels) if rt.src_labels else None,
                    "dst_labels": sorted(rt.dst_labels) if rt.dst_labels else None,
                }
                self._register(self._rel_table_name(name, rel_type, i), path, props)

    def _register(self, table: str, path: str, props: dict) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        meta = json.dumps(props).replace("'", "''")
        self.spark.sql(
            f"CREATE TABLE {table} USING {self.fmt} "
            f"LOCATION '{path}' TBLPROPERTIES ('graph_meta' = '{meta}')"
        )
        self.spark.catalog.refreshTable(table)

    # -- load (catalog-only: no schema.json involved) ------------------------
    def _graph_tables(self, name: str) -> List[tuple]:
        prefix = f"{_ident(name)}__"
        out = []
        for row in self.spark.sql(f"SHOW TABLES IN {self.database}").collect():
            tbl = row["tableName"]
            if not tbl.startswith(prefix):
                continue
            full = f"{self.database}.{tbl}"
            meta_rows = self.spark.sql(
                f"SHOW TBLPROPERTIES {full} ('graph_meta')"
            ).collect()
            if not meta_rows or meta_rows[0]["value"].startswith("Table"):
                continue  # not one of ours
            out.append((full, json.loads(meta_rows[0]["value"])))
        return out

    def graph_from_catalog(self, name: str) -> PropertyGraph:
        """Rebuild a graph purely from catalog tables + their properties —
        the Hive round-trip: a different session (or engine) pointing at
        the same metastore sees the same graph by name."""
        nodes, rels = [], []
        for full, meta in self._graph_tables(name):
            df = self.spark.table(full)
            if meta["kind"] == "node":
                nodes.append(NodeTable.create(meta["labels"], df))
            else:
                rels.append(
                    RelationshipTable.create(
                        meta["type"],
                        df,
                        src_labels=meta.get("src_labels"),
                        dst_labels=meta.get("dst_labels"),
                    )
                )
        if not nodes:
            raise KeyError(f"no catalog tables for graph {name!r} in {self.database}")
        return PropertyGraph(nodes, rels, name=name)

    def catalog_graph_names(self) -> List[str]:
        names = set()
        for row in self.spark.sql(f"SHOW TABLES IN {self.database}").collect():
            m = re.match(r"(.+?)__(node|relationship)__", row["tableName"])
            if m:
                names.add(m.group(1))
        return sorted(names)

    def delete(self, name: str) -> None:
        for full, _ in self._graph_tables(name):
            self.spark.sql(f"DROP TABLE IF EXISTS {full}")
        super().delete(name)
