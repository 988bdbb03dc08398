"""Deterministic training-shard sink.

The last step of a training-data pipeline: write the corpus as N shards a
training job can map workers onto. Two properties matter at 100 TB and are
both hash-derived (no RNG, no order dependence):

- **determinism** — a document's shard depends only on its key (md5, same
  discipline as operators/sampling.py), so re-running the pipeline, adding
  executors, or repartitioning upstream never moves a document between
  shards;
- **balance + locality** — one output file per shard (`repartition(N,
  shard)` before the partitioned write), so shard k is one contiguous
  parquet file a data-loader worker can own.

This is a sink the reference doesn't have (its sinks are graph-shaped:
FS graph layout fs.py, Neo4j merge/bulk); it's part of the pipeline
surface, verified by round-trip tests rather than a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SHARD_COL = "shard"


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Adds the deterministic shard id: first 8 md5 hex chars of the key,
    mod n_shards — stable across runs, partitionings and engines."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn(SHARD_COL, (h % n_shards).cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    mode: str = "error",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` hash-assigned shards under
    ``path/shard=K/``. One shuffle (repartition on the shard id) so each
    shard directory holds exactly one file; everything else is the
    format writer. Readers: ``read_training_shards`` or any parquet
    reader with partition discovery."""
    sharded = with_shard(df, key_col, n_shards)
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .write.mode(mode)
        .partitionBy(SHARD_COL)
        .format(fmt)
        .save(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, shards=None, fmt: str = "parquet"
) -> DataFrame:
    """Read the sharded corpus back; ``shards`` (iterable of ints)
    restricts to a subset via partition pruning — a data-loader worker
    reads only its own shard directories, never the full corpus."""
    df = spark.read.format(fmt).load(path)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin(*[int(s) for s in shards]))
    return df
