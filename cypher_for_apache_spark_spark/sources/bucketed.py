"""Bucketed graph storage: co-located pattern joins without shuffles.

The 100 TB layout: node tables are bucketed (and sorted) by ``id``,
relationship tables by ``src`` (out-edge layout; optionally a second copy
bucketed by ``dst`` for reverse expands). A pattern join
``node.id == rel.src`` over two tables bucketed the same way needs **no
exchange on either side** — on a 1000-executor cluster that removes the
dominant cost of multi-hop traversals. (The reference leaves layout to
Hive tables, FSGraphSource with hiveDatabaseName; bucketing is the
Spark-native expression of the same idea.)

Requires a session with a (local is fine) Hive-less catalog warehouse —
``saveAsTable`` is the only writer API that records bucket specs.
"""

from __future__ import annotations

import json
import re
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from cypher_for_apache_spark_spark.graph import NodeTable, PropertyGraph, RelationshipTable


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name).lower()


class BucketedGraphSource:
    def __init__(self, spark: SparkSession, database: str = "graphs", location: Optional[str] = None):
        self.spark = spark
        self.database = _safe(database)
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.database}{loc}")

    # -- naming ---------------------------------------------------------------
    def _t(self, graph: str, kind: str, part: str) -> str:
        return f"{self.database}.{_safe(graph)}__{kind}__{part}"

    def _meta_table(self, graph: str) -> str:
        return f"{self.database}.{_safe(graph)}__meta"

    # -- store -----------------------------------------------------------------
    def store(
        self,
        name: str,
        graph: PropertyGraph,
        buckets: int = 16,
        reverse_layout: bool = False,
        mode: str = "error",
    ) -> None:
        meta = {"buckets": buckets, "nodes": [], "relationships": []}
        for combo, nt in graph.node_tables.items():
            part = _safe("_".join(sorted(combo)) or "none")
            table = self._t(name, "nodes", part)
            (
                nt.df.write.mode(mode)
                .bucketBy(buckets, "id")
                .sortBy("id")
                .saveAsTable(table)
            )
            meta["nodes"].append({"table": table, "labels": sorted(combo)})
        for i, rt in enumerate(graph.all_rel_tables()):
            part = _safe(rt.rel_type) + (f"_{i}" if i else "")
            table = self._t(name, "rels", part)
            (
                rt.df.write.mode(mode)
                .bucketBy(buckets, "src")
                .sortBy("src")
                .saveAsTable(table)
            )
            entry = {
                "table": table,
                "type": rt.rel_type,
                "src_labels": sorted(rt.src_labels) if rt.src_labels else None,
                "dst_labels": sorted(rt.dst_labels) if rt.dst_labels else None,
            }
            if reverse_layout:
                rev = table + "__by_dst"
                (
                    rt.df.write.mode(mode)
                    .bucketBy(buckets, "dst")
                    .sortBy("dst")
                    .saveAsTable(rev)
                )
                entry["reverse_table"] = rev
            meta["relationships"].append(entry)
        # recognized-pattern (triplet) tables ride along: bucketed by the
        # source node id so a triplet scan joined onward against bucketed
        # node tables still avoids an exchange on the triplet side
        meta["triplets"] = []
        for (rel_type, src_combo, dst_combo), tt in graph.triplet_tables.items():
            part = _safe(
                "_".join(sorted(src_combo)) + "__" + _safe(rel_type) + "__" + "_".join(sorted(dst_combo))
            )
            table = self._t(name, "triplets", part)
            (
                tt.df.write.mode(mode)
                .bucketBy(buckets, "src_id")
                .sortBy("src_id")
                .saveAsTable(table)
            )
            meta["triplets"].append(
                {
                    "table": table,
                    "type": rel_type,
                    "src_labels": sorted(src_combo),
                    "dst_labels": sorted(dst_combo),
                }
            )
        self.spark.createDataFrame([(json.dumps(meta),)], "meta string").write.mode(
            "overwrite"
        ).saveAsTable(self._meta_table(name))

    # -- load -------------------------------------------------------------------
    def graph(self, name: str, layout: str = "auto") -> PropertyGraph:
        """Load the graph. With ``layout='auto'`` (default) relationship
        tables carry BOTH physical copies when a reverse layout was stored,
        and the planner picks the copy matching each expand's direction;
        'src'/'dst' force one layout."""
        meta = json.loads(
            self.spark.table(self._meta_table(name)).first()["meta"]
        )
        nodes = [
            NodeTable.create(n["labels"], self.spark.table(n["table"]))
            for n in meta["nodes"]
        ]
        rels = []
        for r in meta["relationships"]:
            table = r["table"]
            rev = r.get("reverse_table")
            if layout == "dst" and rev:
                table = rev
            rt = RelationshipTable.create(
                r["type"],
                self.spark.table(table),
                src_labels=r.get("src_labels"),
                dst_labels=r.get("dst_labels"),
            )
            if layout == "auto" and rev:
                rt.df_by_dst = self.spark.table(rev)
            rels.append(rt)
        g = PropertyGraph(nodes, rels, name=name)
        from cypher_for_apache_spark_spark.graph import TripletTable

        for t in meta.get("triplets", []):
            g.add_triplet_table(
                TripletTable.create(
                    t["type"],
                    self.spark.table(t["table"]),
                    t["src_labels"],
                    t["dst_labels"],
                )
            )
        return g

    def delete(self, name: str) -> None:
        for row in self.spark.sql(f"SHOW TABLES IN {self.database}").collect():
            if row["tableName"].startswith(_safe(name) + "__"):
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {self.database}.{row['tableName']}"
                )

    def graph_names(self):
        out = set()
        for row in self.spark.sql(f"SHOW TABLES IN {self.database}").collect():
            if row["tableName"].endswith("__meta"):
                out.add(row["tableName"][: -len("__meta")])
        return sorted(out)
