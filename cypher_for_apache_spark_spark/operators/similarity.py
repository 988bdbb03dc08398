"""Similarity search over embedding columns (array<float>).

- ``knn_brute``: exact cosine top-k for a query vector — the correctness
  baseline. Dot products run JVM-side via zip_with/aggregate (no Python).
- ``knn_join_lsh``: random-hyperplane LSH bucketing for all-pairs /
  batch-query ANN — the 100 TB path: candidates come from an equi-join on
  (table, bucket signature), then exact re-ranking within buckets.
- ``ivf_*``: inverted-file index (k-means-lite centroids trained with plain
  DataFrame aggregations), probe-limited search.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Null for zero-norm vectors (instead of an ANSI division error —
    Spark 4 sessions default to ANSI mode)."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def knn_brute(
    df: DataFrame,
    query_vec: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. One narrow scan +
    a k-row ordered take (Spark's TakeOrderedAndProject — no full sort)."""
    q = _vec_lit(query_vec)
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def random_hyperplanes(dim: int, planes: int, seed: int = 42) -> List[List[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec_col: Column, hyperplanes: List[List[float]]) -> Column:
    """Sign-of-projection bit signature packed into a long."""
    out = F.lit(0)
    v = as_double(vec_col)
    for i, h in enumerate(hyperplanes):
        bit = F.when(dot(v, _vec_lit(h)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = out.bitwiseOR(bit)
    return out


def knn_join_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k: bucket by hyperplane signature, exact
    cosine within buckets, window top-k per id. The candidate join key is
    one long — scales linearly in corpus size for balanced buckets."""
    hps = random_hyperplanes(dim, planes, seed)
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        lsh_bucket(F.col(vec_col), hps).alias("_bucket"),
    )
    x = b.alias("x")
    y = b.alias("y")
    pairs = x.join(
        y,
        (F.col("x._bucket") == F.col("y._bucket")) & (F.col("x._id") != F.col("y._id")),
    ).select(
        F.col("x._id").alias(id_col),
        F.col("y._id").alias("neighbor"),
        F.round(cosine(as_double(F.col("x._v")), as_double(F.col("y._v"))), 6).alias("sim"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("neighbor"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# -- IVF (inverted file) index ------------------------------------------------

def ivf_train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    iterations: int = 2,
) -> List[List[float]]:
    """k-means-lite centroid training with pure DataFrame aggregations:
    deterministic seeding (hash-sampled rows), Lloyd iterations via
    argmin-assignment + per-cluster mean."""
    seeds = (
        df.select(as_double(F.col(vec_col)).alias("v"), F.col(id_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]
    for _ in range(iterations):
        assigned = _assign(df, vec_col, centroids).select(
            F.col("_centroid"), F.posexplode(as_double(F.col(vec_col)))
        )
        means = (
            assigned.groupBy("_centroid", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("_centroid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("vs"))
            .select("_centroid", F.col("vs.m").alias("v"))
            .collect()
        )
        for r in means:
            centroids[r["_centroid"]] = list(r["v"])
    return centroids


def _assign(df: DataFrame, vec_col: str, centroids: List[List[float]]) -> DataFrame:
    """argmin-distance centroid assignment, JVM-side."""
    v = as_double(F.col(vec_col))
    best_id, best_d = F.lit(0), None
    for i, c in enumerate(centroids):
        diff = F.zip_with(v, _vec_lit(c), lambda x, y: (x - y) * (x - y))
        d = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
        if best_d is None:
            best_d = d
        else:
            cond = d < best_d
            best_id = F.when(cond, F.lit(i)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
    return df.withColumn("_centroid", best_id)


def ivf_search(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: List[List[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probes: int = 4,
) -> DataFrame:
    """Probe the n_probes nearest centroids' partitions only, exact re-rank
    inside. At scale the assignment column is precomputed/partitioned-by."""
    dists = [
        (i, sum((a - b) * (a - b) for a, b in zip(query_vec, c)))
        for i, c in enumerate(centroids)
    ]
    probes = [i for i, _ in sorted(dists, key=lambda t: t[1])[:n_probes]]
    assigned = _assign(df, vec_col, centroids).filter(F.col("_centroid").isin(probes))
    q = _vec_lit(query_vec)
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        assigned.select(F.col(id_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )
