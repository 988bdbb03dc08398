"""Deterministic sampling / splitting / packing for training-data pipelines.

Every operator here is *hash-deterministic*: the decision for a row depends
only on a stable key (via md5, which exists with identical semantics in
Spark and DuckDB), never on partitioning, row order, or an RNG seed. That is
the property a 100 TB pipeline actually needs — re-running the job, adding
executors, or re-partitioning the input must not change which documents land
in the training split.

Scale design: splits and samples are narrow stateless projections (no
shuffle at all — the filter/assignment pushes down next to the scan);
stratified sampling and sequence packing each cost exactly one window
shuffle on their partition key. No Python UDFs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# hash space for split cutoffs: first 8 hex chars of md5 = 32 bits.
# Comparisons are done on the *hex string* (fixed width, lowercase), which
# orders identically to the integer value in every engine.
_HASH_BITS = 32
_HASH_CHARS = 8


def hash_key(col: Column) -> Column:
    """Stable 8-hex-char bucket key for a row: md5 of the stringified key.
    Lowercase hex compares lexicographically == numerically."""
    return F.substring(F.md5(col.cast("string")), 1, _HASH_CHARS)


def split_cutoffs(weights: Dict[str, float]) -> List[Tuple[str, str]]:
    """[(split_name, upper_cutoff_hex)] with cumulative cutoffs over the
    32-bit hash space; the last split absorbs rounding remainder."""
    total = float(sum(weights.values()))
    out: List[Tuple[str, str]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        out.append((name, format(round(acc * (1 << _HASH_BITS)), "08x")))
    out.append((names[-1], "g"))  # > 'f' sentinel: catches everything
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test...) by hashing a
    stable key — deterministic, partition-independent, re-run-stable.

    No shuffle: the assignment is a per-row expression; downstream writers
    can partition by the split column.
    """
    h = hash_key(F.col(key_col))
    cutoffs = split_cutoffs(weights)
    expr = F.when(h < F.lit(cutoffs[0][1]), F.lit(cutoffs[0][0]))
    for name, cut in cutoffs[1:-1]:
        expr = expr.when(h < F.lit(cut), F.lit(name))
    expr = expr.otherwise(F.lit(cutoffs[-1][0]))
    return df.withColumn(split_col, expr)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket falls
    below the cutoff. Unlike ``df.sample`` this is stable across runs,
    partitionings, and engines (the DuckDB oracle reproduces it exactly)."""
    cutoff = format(round(fraction * (1 << _HASH_BITS)), "08x")
    return df.filter(hash_key(F.col(key_col)) < F.lit(cutoff))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Exactly ``k`` rows per group, chosen by hash order (deterministic
    reservoir): rank rows within each group by md5(key) and keep the first
    k. One window shuffle on the group key; ties are impossible because the
    full md5 of distinct keys differs."""
    w = W.partitionBy(group_col).orderBy(F.md5(F.col(key_col).cast("string")))
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    part_col: str,
    order_col: str,
    bin_col: str = "bin",
) -> DataFrame:
    """Greedy contiguous sequence packing: within each ``part_col`` shard,
    walk rows in ``order_col`` order and assign bin = floor(tokens-before /
    max_tokens). Deterministic, one window shuffle, and — unlike first-fit
    bin packing — embarrassingly parallel across shards, which is the only
    packing discipline that scales to 100 TB (global FFD is inherently
    sequential). A document may straddle a bin boundary; trainers that
    require hard boundaries truncate at read time.
    """
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        bin_col, F.floor(before / F.lit(max_tokens)).cast("long")
    )
