"""Write-only Neo4j bulk-import CSV sink.

Parity target: the reference exports a property graph in the CSV layout
``neo4j-admin import`` consumes — one directory per node label combination
and per relationship type, each holding a one-line ``schema.csv`` header
(``prop:type`` fields, ``:ID`` / ``:START_ID`` / ``:END_ID`` / ``:LABEL``
markers) plus Spark-written data part files, topped by an ``import.sh``
that assembles the neo4j-admin command
(morpheus-spark-cypher/.../io/neo4j/Neo4jBulkCSVDataSink.scala:44-178).

Scale: the data files are written by Spark's distributed CSV writer (one
part per partition, no driver materialization); only the one-line header
files and the shell script are driver-side. Array properties are joined
with ``array_delimiter`` per the bulk-import format.
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, functions as F, types as T

from cypher_for_apache_spark_spark.graph import PropertyGraph

SCRIPT_TEMPLATE = """#!/bin/sh
if [ $# -ne 1 ]; then
  echo "Please provide the path to your Neo4j installation (e.g. /usr/share/neo4j/)"
  exit 1
fi
${{1}}/bin/neo4j-admin import \\
  --database=graph.db \\
  --delimiter="," \\
  --array-delimiter="{array_delimiter}" \\
  --id-type=INTEGER \\
{node_args} \\
{rel_args}
"""


def _bulk_type(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "double"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "datetime"
    if isinstance(dt, T.ArrayType):
        return f"{_bulk_type(dt.elementType)}[]"
    if isinstance(dt, T.NullType):
        return "string"
    raise ValueError(f"no Neo4j bulk import type for {dt.simpleString()}")


class Neo4jBulkCSVSink:
    """Write-only: ``store`` exports; reads raise (same contract as the
    reference's write-only PGDS)."""

    def __init__(self, spark, root: str, array_delimiter: str = "|"):
        self.spark = spark
        self.root = root
        self.array_delimiter = array_delimiter

    # -- helpers ---------------------------------------------------------
    def _stringify_arrays(self, df: DataFrame) -> DataFrame:
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.ArrayType):
                cols.append(
                    F.array_join(
                        F.transform(F.col(f.name), lambda x: x.cast("string")),
                        self.array_delimiter,
                    ).alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    def _write_header(self, path: str, fields: List[str]) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(",".join(fields) + "\n")

    # -- export ----------------------------------------------------------
    def store(self, name: str, graph: PropertyGraph, mode: str = "error") -> str:
        base = os.path.join(self.root, name)
        node_args, rel_args = [], []
        for combo, nt in sorted(graph.node_tables.items(), key=lambda kv: sorted(kv[0])):
            labels = ":".join(sorted(combo))
            d = os.path.join(base, "nodes", "_".join(sorted(combo)))
            df = self._stringify_arrays(nt.df)
            header = []
            for f in df.schema.fields:
                if f.name == "id":
                    header.append("id:ID")
                else:
                    header.append(f"{f.name}:{_bulk_type(nt.df.schema[f.name].dataType)}")
            self._write_header(os.path.join(d, "schema.csv"), header)
            df.write.mode(mode).option("quoteAll", False).csv(os.path.join(d, "data"))
            node_args.append(
                f'  --nodes:{labels} "{d}/schema.csv,{d}/data/part.*\\.csv"'
            )
        for rel_type, tables in sorted(graph.rel_tables.items()):
            for i, rt in enumerate(tables):
                suffix = f"_{i}" if len(tables) > 1 else ""
                d = os.path.join(base, "relationships", rel_type + suffix)
                df = self._stringify_arrays(rt.df.drop("id"))
                header = []
                for f in df.schema.fields:
                    if f.name == "src":
                        header.append(":START_ID")
                    elif f.name == "dst":
                        header.append(":END_ID")
                    else:
                        header.append(
                            f"{f.name}:{_bulk_type(rt.df.schema[f.name].dataType)}"
                        )
                self._write_header(os.path.join(d, "schema.csv"), header)
                df.write.mode(mode).option("quoteAll", False).csv(os.path.join(d, "data"))
                rel_args.append(
                    f'  --relationships:{rel_type} "{d}/schema.csv,{d}/data/part.*\\.csv"'
                )
        script = SCRIPT_TEMPLATE.format(
            array_delimiter=self.array_delimiter,
            node_args=" \\\n".join(node_args),
            rel_args=" \\\n".join(rel_args),
        )
        script_path = os.path.join(base, "import.sh")
        with open(script_path, "w") as fh:
            fh.write(script)
        os.chmod(script_path, 0o755)
        return base

    # write-only PGDS contract
    def graph(self, name: str):
        raise NotImplementedError("write-only sink")

    def has_graph(self, name: str) -> bool:
        return False
