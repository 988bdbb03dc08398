"""Filesystem property-graph data source.

Directory layout (mirrors the reference's FSGraphSource /
GraphDirectoryStructure, morpheus-spark-cypher/.../io/fs/FSGraphSource.scala:56-110):

    <root>/<graph_name>/
        schema.json                     # label combos, rel types, formats
        nodes/<combo-dir>/...           # one dataset per label combination
        relationships/<TYPE>/...        # one dataset per relationship type

Formats: parquet (default), csv, orc, json — anything
``spark.read.format(fmt)`` supports. ``schema.json`` carries the label
combination for each node dir (so directory-name mangling is never
load-bearing) plus the per-table Spark schema for formats that need it
(csv/json read with an explicit schema — no inference in production paths).

Scale notes: writes go through the normal DataFrame writer so callers can
``.repartition()``/sort before ``store``; reads are plain format scans with
full predicate pushdown / partition pruning.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from cypher_for_apache_spark_spark.graph import NodeTable, PropertyGraph, RelationshipTable


def _combo_dirname(labels) -> str:
    safe = [re.sub(r"[^A-Za-z0-9]", "_", l) for l in sorted(labels)]
    return "__".join(safe) if safe else "_no_label"


class FSGraphSource:
    """Read/write property graphs under a filesystem root."""

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt

    # -- paths ---------------------------------------------------------------
    def _graph_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _schema_path(self, name: str) -> str:
        return os.path.join(self._graph_dir(name), "schema.json")

    # -- store ----------------------------------------------------------------
    def store(self, name: str, graph: PropertyGraph, mode: str = "error") -> None:
        meta = {"format": self.fmt, "nodes": [], "relationships": []}
        for combo, nt in graph.node_tables.items():
            d = _combo_dirname(combo)
            path = os.path.join(self._graph_dir(name), "nodes", d)
            self._encode_for_write(nt.df).write.format(self.fmt).mode(mode).options(
                **self._write_opts()
            ).save(path)
            meta["nodes"].append(
                {"dir": d, "labels": sorted(combo), "schema": nt.df.schema.jsonValue()}
            )
        for rel_type, rts in graph.rel_tables.items():
            for i, rt in enumerate(rts):
                d = re.sub(r"[^A-Za-z0-9]", "_", rel_type) + (f"__{i}" if i else "")
                path = os.path.join(self._graph_dir(name), "relationships", d)
                self._encode_for_write(rt.df).write.format(self.fmt).mode(mode).options(
                    **self._write_opts()
                ).save(path)
                meta["relationships"].append(
                    {
                        "dir": d,
                        "type": rel_type,
                        "schema": rt.df.schema.jsonValue(),
                        "src_labels": sorted(rt.src_labels) if rt.src_labels else None,
                        "dst_labels": sorted(rt.dst_labels) if rt.dst_labels else None,
                    }
                )
        os.makedirs(self._graph_dir(name), exist_ok=True)
        with open(self._schema_path(name), "w") as f:
            json.dump(meta, f, indent=2)

    # -- load ------------------------------------------------------------------
    def graph(self, name: str) -> PropertyGraph:
        with open(self._schema_path(name)) as f:
            meta = json.load(f)
        fmt = meta.get("format", self.fmt)
        nodes, rels = [], []
        for n in meta["nodes"]:
            path = os.path.join(self._graph_dir(name), "nodes", n["dir"])
            df = self._read(path, fmt, n.get("schema"))
            nodes.append(NodeTable.create(n["labels"], df))
        for r in meta["relationships"]:
            path = os.path.join(self._graph_dir(name), "relationships", r["dir"])
            df = self._read(path, fmt, r.get("schema"))
            rels.append(
                RelationshipTable.create(
                    r["type"],
                    df,
                    src_labels=r.get("src_labels"),
                    dst_labels=r.get("dst_labels"),
                )
            )
        return PropertyGraph(nodes, rels, name=name)

    def graph_names(self):
        if not os.path.isdir(self.root):
            return []
        return [
            d
            for d in sorted(os.listdir(self.root))
            if os.path.isfile(self._schema_path(d))
        ]

    def delete(self, name: str) -> None:
        import shutil

        shutil.rmtree(self._graph_dir(name), ignore_errors=True)

    def has_graph(self, name: str) -> bool:
        return os.path.isfile(self._schema_path(name))

    # -- helpers -----------------------------------------------------------------
    def _write_opts(self) -> Dict[str, str]:
        return {"header": "true"} if self.fmt == "csv" else {}

    @staticmethod
    def _is_complex(dt: T.DataType) -> bool:
        return isinstance(dt, (T.ArrayType, T.StructType, T.MapType))

    def _encode_for_write(self, df: DataFrame) -> DataFrame:
        """CSV can't hold arrays/structs — serialize them as JSON strings;
        the recorded schema restores them on read."""
        if self.fmt != "csv":
            return df
        cols = [
            F.to_json(f.name).alias(f.name) if self._is_complex(f.dataType) else F.col(f.name)
            for f in df.schema.fields
        ]
        return df.select(*cols)

    def _read(self, path: str, fmt: str, schema_json: Optional[dict]) -> DataFrame:
        reader = self.spark.read.format(fmt)
        original = T.StructType.fromJson(schema_json) if schema_json else None
        if fmt == "csv":
            reader = reader.option("header", "true")
            if original is not None:
                wire = T.StructType(
                    [
                        T.StructField(
                            f.name,
                            T.StringType() if self._is_complex(f.dataType) else f.dataType,
                            True,
                        )
                        for f in original.fields
                    ]
                )
                df = reader.schema(wire).load(path)
                cols = [
                    F.from_json(f.name, f.dataType).alias(f.name)
                    if self._is_complex(f.dataType)
                    else F.col(f.name)
                    for f in original.fields
                ]
                return df.select(*cols)
            return reader.load(path)
        if fmt == "json" and original is not None:
            reader = reader.schema(original)
        return reader.load(path)
