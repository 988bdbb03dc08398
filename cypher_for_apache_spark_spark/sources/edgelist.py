"""Edge-list graph source (reference: EdgeListDataSource,
morpheus-spark-cypher/.../io/edgelist/EdgeListDataSource.scala:69-105):
plain ``src dst`` rows become a graph with ``:V`` nodes for every distinct
endpoint and one ``:E`` relationship per row.

Scale note: distinct-endpoints is one shuffle on a long key; edge ids come
from the row content (src, dst, ordinal within duplicates) so the result is
deterministic — the reference used monotonically_increasing_id, which is
partitioning-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cypher_for_apache_spark_spark.graph import NodeTable, PropertyGraph, RelationshipTable


def from_edge_df(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> PropertyGraph:
    extra = [c for c in edges.columns if c not in (src_col, dst_col)]
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        *[F.col(c) for c in extra],
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    w = W.partitionBy("src", "dst").orderBy(F.lit(1))
    # any columns beyond the endpoints ride along as :E properties
    # (weights for sssp, timestamps, ...)
    rels = e.withColumn("_ordinal", F.row_number().over(w)).select(
        (
            F.xxhash64(F.col("src"), F.col("dst"), F.col("_ordinal"))
        ).alias("id"),
        "src",
        "dst",
        *[F.col(c) for c in extra],
    )
    return PropertyGraph(
        [NodeTable.create(["V"], nodes)],
        [RelationshipTable.create("E", rels)],
        name="edgelist",
    )


def from_csv(spark: SparkSession, path: str, delimiter: str = " ") -> PropertyGraph:
    df = (
        spark.read.option("delimiter", delimiter)
        .option("comment", "#")
        .schema("src long, dst long")
        .csv(path)
    )
    return from_edge_df(df)
