"""Shared bootstrap for the runnable examples (the PySpark analogue of the
reference's morpheus-examples module — each file mirrors one reference
example's behavior; none of them copy its code).

Every example exposes ``run(spark) -> None`` so tests can drive them all on
one shared session; executing a file directly spins up a throwaway
``local[*]`` session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def local_session() -> SparkSession:
    return (
        SparkSession.builder.master("local[*]")
        .appName("examples")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main(run) -> None:
    spark = local_session()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
