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

import pandas as pd  # type-hint resolution for the Arrow-batched UDF
from pyspark.sql import Column, DataFrame, functions as F

from cypher_for_apache_spark_spark.materialize import materialize


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


def lsh_buckets_batch(all_planes: List[List[List[float]]]):
    """Arrow-batched signature computation: ONE numpy matmul per batch
    computes every (band, plane) projection at once.

    The JVM-expression alternative (``lsh_bucket`` per band) builds
    bands*planes ArrayAggregate lambdas whose whole-stage codegen takes
    seconds to compile on first run and walks each array per plane; a
    (batch x dim) @ (dim x bands*planes) matmul is both compile-free and
    the textbook dense-linear-algebra path. Returns a UDF producing
    array<long> of one packed sign-bit bucket per band."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    per_band = [np.asarray(p, dtype=np.float64) for p in all_planes]
    planes_t = np.concatenate(per_band, axis=0).T  # (dim, bands*planes)
    sizes = [p.shape[0] for p in per_band]
    weights = []
    offset = 0
    for n in sizes:
        weights.append((offset, n))
        offset += n

    @pandas_udf("array<long>")
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        proj = m @ planes_t >= 0  # (batch, total planes) sign bits
        out = []
        buckets = np.zeros((proj.shape[0], len(sizes)), dtype=np.int64)
        for b, (off, n) in enumerate(weights):
            bits = proj[:, off : off + n]
            buckets[:, b] = bits @ (1 << np.arange(n, dtype=np.int64))
        return pd.Series(list(buckets))

    return _sig


def lsh_bucket(vec_col: Column, hyperplanes: List[List[float]]) -> Column:
    """Sign-of-projection bit signature packed into a long."""
    out = F.lit(0)
    v = as_double(vec_col)
    for i, h in enumerate(hyperplanes):
        bit = F.when(dot(v, _vec_lit(h)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = out.bitwiseOR(bit)
    return out


def lsh_candidates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    bands: int = 4,
    max_bucket: int = 1024,
    directed: bool = True,
) -> DataFrame:
    """Distinct directed candidate pairs ``(_ida, _idb)`` that collide in at
    least one LSH band. Shared by ``knn_join_lsh`` (top-k per id, needs both
    directions) and ``cosine_dup_pairs_lsh`` (undirected —
    ``directed=False`` bakes ``_ida < _idb`` into the join condition so
    each pair is emitted once, not both orientations with half discarded
    downstream). See ``knn_join_lsh`` for the scale rationale of
    multi-band OR-amplification and the per-bucket cap."""
    from pyspark.sql import Window as W

    all_planes = [random_hyperplanes(dim, planes, seed + 1000 * i) for i in range(bands)]
    try:
        sig = lsh_buckets_batch(all_planes)(F.col(vec_col))
        with_sigs = df.select(F.col(id_col).alias("_id"), sig.alias("_sigs"))
    except ImportError:  # no pandas/pyarrow: JVM-expression fallback
        with_sigs = df.select(
            F.col(id_col).alias("_id"),
            F.array(
                *[lsh_bucket(F.col(vec_col), hp) for hp in all_planes]
            ).alias("_sigs"),
        )
    banded = with_sigs.select(
        "_id", F.posexplode("_sigs").alias("band", "bucket")
    )
    capped = (
        banded.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("band", "bucket").orderBy(F.xxhash64("_id"), F.col("_id"))
            ),
        )
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    # materialize before the self-join: concurrent stages racing an
    # unmaterialized cache each run the signature UDF + window from scratch;
    # scoped (block-manager) storage, freed when callers drop the result
    capped = materialize(capped)
    x = capped.alias("x")
    y = capped.alias("y")
    id_cond = (
        F.col("x._id") != F.col("y._id")
        if directed
        else F.col("x._id") < F.col("y._id")
    )
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & id_cond,
        )
        .select(F.col("x._id").alias("_ida"), F.col("y._id").alias("_idb"))
        .dropDuplicates()
    )


def knn_join_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    bands: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """Approximate all-pairs top-k via multi-band random-hyperplane LSH.

    Scale design:
    - **OR-amplification**: ``bands`` independent ``planes``-bit signatures;
      a pair is a candidate if it collides in ANY band. One wide signature
      either misses near neighbors (too many bits) or degenerates into a
      handful of huge buckets (too few) — multiple narrow bands give high
      recall while keeping each band's buckets small.
    - **Per-bucket cap**: within each (band, bucket), only the first
      ``max_bucket`` vectors (deterministic hash order) emit pairs. A hot
      bucket (duplicate embeddings, zero vectors, skewed corpora) otherwise
      goes quadratic — the cap bounds any bucket's work at max_bucket^2 and
      loses only candidates a *less* crowded band will still surface.
    - **Pair dedup before re-ranking**: candidates carry only (id, id);
      vectors are joined back and cosine computed once per distinct pair,
      not once per colliding band.

    Recall against knn_brute is measured in tests (recall@k on the test
    embeddings), so parameter changes are quantified, not guessed."""
    from pyspark.sql import Window as W

    cand = lsh_candidates(
        df,
        vec_col=vec_col,
        id_col=id_col,
        planes=planes,
        dim=dim,
        seed=seed,
        bands=bands,
        max_bucket=max_bucket,
    )
    # norms are per-vector, not per-pair: compute them once in the joined
    # sides so the pair re-rank runs ONE array pass (dot) instead of three
    va = df.select(
        F.col(id_col).alias("_ida"),
        as_double(F.col(vec_col)).alias("_va"),
    ).withColumn("_na", norm(F.col("_va")))
    vb = df.select(
        F.col(id_col).alias("_idb"),
        as_double(F.col(vec_col)).alias("_vb"),
    ).withColumn("_nb", norm(F.col("_vb")))
    denom = F.col("_na") * F.col("_nb")
    sim = F.when(denom != 0, dot(F.col("_va"), F.col("_vb")) / denom)
    pairs = (
        cand.join(va, "_ida")
        .join(vb, "_idb")
        .select(
            F.col("_ida").alias(id_col),
            F.col("_idb").alias("neighbor"),
            F.round(sim, 6).alias("sim"),
        )
    )
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
    train_fraction: Optional[float] = None,
    max_train_rows: Optional[int] = None,
) -> List[List[float]]:
    """k-means-lite centroid training with pure DataFrame aggregations:
    deterministic seeding (hash-sampled rows), Lloyd iterations via
    argmin-assignment + per-cluster mean.

    ``train_fraction`` fits the model on a deterministic hash sample (the
    standard scale move: centroid quality needs a representative sample,
    not the full corpus — at 100 TB nobody Lloyd-iterates every row). The
    sample is hash-of-id so training stays partition- and rerun-stable.

    ``max_train_rows`` additionally bounds the sample and runs the Lloyd
    iterations driver-side in numpy: ONE Spark job (TakeOrdered of the
    hash-smallest rows) replaces 2 jobs + 4 shuffles per iteration. The
    rows are chosen by md5-of-id order, so the model is identical across
    runs/partitionings; the collected matrix is max_train_rows x dim —
    bounded regardless of corpus size, which is the point."""
    if train_fraction is not None:
        from cypher_for_apache_spark_spark.operators.sampling import hash_sample

        df = hash_sample(df, id_col, train_fraction)
    if max_train_rows is not None:
        import numpy as np

        rows = (
            df.select(as_double(F.col(vec_col)).alias("v"), F.col(id_col))
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(max_train_rows)
            .collect()
        )
        X = np.asarray([r["v"] for r in rows], dtype=np.float64)
        C = X[:n_centroids].copy()
        for _ in range(iterations):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)
            for k in range(len(C)):
                m = X[lab == k]
                if len(m):
                    C[k] = m.mean(axis=0)
        return [list(map(float, c)) for c in C]
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
    """argmin-distance centroid assignment.

    Arrow-batched numpy path by default: one (batch x dim) @ (dim x k)
    matmul per batch. The JVM-expression alternative inlines k*dim literals
    into a per-centroid when-chain whose whole-stage codegen recompiles for
    EVERY new centroid model (distinct literals never hit the codegen
    cache) — measured seconds of compile per training run. Kept only as the
    no-pandas fallback."""
    try:
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
        c_sq = (C * C).sum(axis=1)  # (k,)

        @pandas_udf("int")
        def argmin_centroid(vecs: pd.Series) -> pd.Series:
            m = np.vstack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is constant
            # per row and drops out of the argmin
            scores = m @ C.T * -2.0 + c_sq  # (batch, k)
            return pd.Series(scores.argmin(axis=1).astype("int32"))

        return df.withColumn("_centroid", argmin_centroid(F.col(vec_col)))
    except ImportError:
        pass
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


# ---------------------------------------------------------------------------
# Portable (cross-engine bit-exact) ANN modes
# ---------------------------------------------------------------------------
#
# The same move that made MinHash/SimHash oracle-checkable: every quantity
# that decides an output row is either an exact integer (order-independent
# under any summation order, reproducible by any engine) or an IEEE
# operation on identical doubles (sqrt/divide of exactly-representable
# integers — correctly rounded everywhere).
#
# - vectors quantize to integers: q_d = round(v_d * scale) as long
# - hyperplanes are deterministic ±1 matrices from md5 hex-digit parity
#   (sign(b,p,d) = +1 iff int(md5(f"{b}:{p}:{d}")[0], 16) is even), so the
#   SQL oracle regenerates them with the same md5
# - projections / distances / dot products are integer sums (exact)
# - cosine similarity is reported as sim_micro =
#   floor(1e6 * dot / sqrt(na2 * nb2)): dot and na2*nb2 are exactly
#   representable doubles (bounded by the quantization scale), so
#   sqrt/divide/floor are bit-identical across engines
#
# The xxhash64/random-hyperplane fast paths above stay the default for
# pure-Spark pipelines; these variants exist so the driver's DuckDB oracle
# can verify the FULL ANN pipeline (bucketing, candidate join, re-rank,
# top-k) hash-exact instead of rows-only.


def portable_signs(bands: int, planes: int, dim: int) -> List[List[List[int]]]:
    """±1 hyperplane entries from md5 hex-digit parity — reproducible in
    any engine with md5 (DuckDB: CAST('0x'||substr(md5(b||':'||p||':'||d),1,1)
    AS INT) % 2)."""
    import hashlib

    return [
        [
            [
                1
                if int(hashlib.md5(f"{b}:{p}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1
                for d in range(dim)
            ]
            for p in range(planes)
        ]
        for b in range(bands)
    ]


def quantize(col: Column, scale: int = 1000) -> Column:
    """array<float> -> array<long> by round(v * scale). With |v| <= ~2 and
    scale 1000, every derived integer (projection, dot, norm^2, and the
    norm^2 product) stays exactly representable in both long and double."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def q_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sim_micro(va: Column, vb: Column, na2: Column, nb2: Column) -> Column:
    """floor(1e6 * cos(va, vb)) as long — deterministic across engines (see
    module comment). Null for zero-norm vectors."""
    s = q_dot(va, vb).cast("double") / F.sqrt((na2 * nb2).cast("double"))
    return F.when((na2 > 0) & (nb2 > 0), F.floor(s * F.lit(1e6)).cast("long"))


def sim_micro_columns(va: Column, vb: Column, na2: Column, nb2: Column) -> Column:
    """``sim_micro`` via an Arrow-batched numpy kernel when pandas/pyarrow
    are available, falling back to the pure-JVM expression.

    The JVM path's ``zip_with``+``aggregate`` higher-order functions are
    CodegenFallback: every candidate pair walks a 64-element fold through
    the interpreter (measured ~17 us/pair — the dominant cost of the LSH
    re-rank, guide §4.2). The numpy kernel computes the same integers —
    int64 row-wise dot (exact), then the IDENTICAL double sequence
    (dot -> double, /, sqrt of the long product cast to double, * 1e6,
    floor), so results are bit-equal (pinned by
    tests/test_portable_ann.py::test_sim_micro_batch_bit_equal) and every
    DuckDB oracle is unaffected."""
    try:
        import numpy as np  # noqa: F401
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf
    except ImportError:
        return sim_micro(va, vb, na2, nb2)

    @pandas_udf("long")
    def _sim(a, b, n2a, n2b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype="object")
        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        d = np.einsum("ij,ij->i", A, B)  # int64, exact
        n2a = n2a.to_numpy()
        n2b = n2b.to_numpy()
        # same double-op sequence as the JVM expression: (double)dot /
        # sqrt((double)(na2 * nb2)), * 1e6, floor
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.floor(
                (d.astype(np.float64) / np.sqrt((n2a * n2b).astype(np.float64)))
                * 1e6
            )
        ok = (n2a > 0) & (n2b > 0)
        out = pd.array(np.where(ok, s, 0.0).astype(np.int64), dtype="Int64")
        out[~ok] = pd.NA
        return pd.Series(out)

    # the callers filter on this column (NOT NULL / >= threshold), and the
    # optimizer pushes that filter below the projection, duplicating the
    # Python evaluation (two ArrowEvalPython nodes, plan-verified — guide
    # §4.4); non-deterministic marking forbids the copy, yielding a single
    # evaluation. The function is pure, so results are unchanged.
    return _sim.asNondeterministic()(va, vb, na2, nb2)


def lsh_candidates_portable(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 6,
    dim: int = 64,
    bands: int = 4,
    scale: int = 1000,
    bucket_cap: Optional[int] = None,
    directed: bool = True,
) -> DataFrame:
    """Directed candidate pairs ``(_ida, _idb)`` colliding in >= 1 portable
    LSH band. Same banded equi-join shape as ``lsh_candidates`` (bounded
    key width, never all-pairs); signatures are integer projections against
    the md5-derived ±1 planes, so every bucket id is cross-engine exact.

    ``directed=False`` bakes ``_ida < _idb`` into the join condition for
    undirected callers (near-dup pair listings): the self-join then emits
    each colliding pair ONCE instead of emitting both orientations and
    discarding half downstream — half the join output rows feeding the
    distinct (identical pair set, guide §2.3: don't compute rows you
    throw away).

    ``bucket_cap``: keep at most this many members per (band, bucket),
    chosen by ``row_number() OVER (PARTITION BY band, bucket ORDER BY
    md5(CAST(id AS STRING)), id)`` — md5 hex compares bytewise in every
    engine, so the survivor set is bit-reproducible in the DuckDB oracle
    with the identical window (unlike the fast path's xxhash64 ordering).
    Without a cap one dense bucket (near-identical vectors — exactly what
    dedup inputs look like) degrades the candidate join toward O(c^2);
    with it, candidates per bucket are bounded by cap*(cap-1)."""
    from pyspark.sql import Window as W

    all_planes = [
        [[float(s) for s in plane] for plane in band]
        for band in portable_signs(bands, planes, dim)
    ]
    qv = quantize(F.col(vec_col), scale)
    sig = lsh_buckets_batch(all_planes)(qv)
    with_sigs = df.select(F.col(id_col).alias("_id"), sig.alias("_sigs"))
    banded = with_sigs.select(
        "_id", F.posexplode("_sigs").alias("band", "bucket")
    )
    if bucket_cap is not None:
        w = W.partitionBy("band", "bucket").orderBy(
            F.md5(F.col("_id").cast("string")), F.col("_id")
        )
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    banded = materialize(banded)
    x = banded.alias("x")
    y = banded.alias("y")
    id_cond = (
        F.col("x._id") != F.col("y._id")
        if directed
        else F.col("x._id") < F.col("y._id")
    )
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & id_cond,
        )
        .select(F.col("x._id").alias("_ida"), F.col("y._id").alias("_idb"))
        .dropDuplicates()
    )


def _quantized_sides(
    df: DataFrame, vec_col: str, id_col: str, scale: int
) -> tuple:
    """(a, b) frames of (id, quantized vec, exact norm^2) for pair joins."""
    qv = quantize(F.col(vec_col), scale)
    base = df.select(F.col(id_col).alias("_qid"), qv.alias("_qv")).withColumn(
        "_n2", q_dot(F.col("_qv"), F.col("_qv"))
    )
    a = base.select(
        F.col("_qid").alias("_ida"), F.col("_qv").alias("_va"), F.col("_n2").alias("_na2")
    )
    b = base.select(
        F.col("_qid").alias("_idb"), F.col("_qv").alias("_vb"), F.col("_n2").alias("_nb2")
    )
    return a, b


def knn_join_lsh_portable(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    planes: int = 6,
    dim: int = 64,
    bands: int = 4,
    scale: int = 1000,
    bucket_cap: Optional[int] = None,
) -> DataFrame:
    """Portable-mode ``knn_join_lsh``: identical pipeline (banded candidates
    -> exact re-rank -> top-k per id), every step cross-engine exact.
    Returns (id, neighbor, sim_micro); ranking is (sim_micro DESC,
    neighbor ASC) — fully integer, so the top-k frontier is deterministic."""
    from pyspark.sql import Window as W

    cand = lsh_candidates_portable(
        df, vec_col, id_col, planes, dim, bands, scale, bucket_cap
    )
    a, b = _quantized_sides(df, vec_col, id_col, scale)
    pairs = (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .select(
            F.col("_ida").alias(id_col),
            F.col("_idb").alias("neighbor"),
            sim_micro_columns(
                F.col("_va"), F.col("_vb"), F.col("_na2"), F.col("_nb2")
            ).alias("sim_micro"),
        )
        .filter(F.col("sim_micro").isNotNull())
    )
    w = W.partitionBy(id_col).orderBy(F.col("sim_micro").desc(), F.col("neighbor"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_dup_pairs_lsh_portable(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold_micro: int = 400000,
    planes: int = 6,
    dim: int = 64,
    bands: int = 8,
    scale: int = 1000,
    bucket_cap: Optional[int] = None,
) -> DataFrame:
    """Portable-mode ``cosine_dup_pairs_lsh``: undirected near-dup pairs
    (id_a < id_b, sim_micro >= threshold_micro) from portable LSH
    candidates — the integer threshold compare makes the predicate exact."""
    cand = lsh_candidates_portable(
        df, vec_col, id_col, planes, dim, bands, scale, bucket_cap,
        directed=False,
    )
    a, b = _quantized_sides(df, vec_col, id_col, scale)
    return (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            sim_micro_columns(
                F.col("_va"), F.col("_vb"), F.col("_na2"), F.col("_nb2")
            ).alias("sim_micro"),
        )
        .filter(F.col("sim_micro") >= threshold_micro)
    )


def portable_seed_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids=8,
    scale: int = 1000,
) -> List[List[int]]:
    """Deterministic integer centroid model: the quantized vectors of the
    ``n_centroids`` rows with the smallest md5(id) (tie-break id) — the
    same hash-order seeding ``ivf_train_centroids`` uses, minus the Lloyd
    refinement whose floating means no SQL oracle can reproduce. Centroid
    index = position in that order.

    ``n_centroids="sqrt"`` scales the model with the corpus:
    k = max(8, floor(sqrt(n))). Fixed k makes cluster size grow linearly
    with n and every within-cluster pairing quadratic; k = sqrt(n) is the
    balance point (assignment O(n*k) vs pairs O(n^2/k), both n^1.5).
    floor(sqrt(n)) on an exactly-representable count is the same IEEE op
    in Spark/Python/DuckDB, so the SQL oracles reproduce k bit-for-bit
    (one count() action here — model fitting, same class as the k-row
    collect below)."""
    if n_centroids == "sqrt":
        n_centroids = max(8, int(math.floor(math.sqrt(df.count()))))
    rows = (
        df.select(quantize(F.col(vec_col), scale).alias("_qv"), F.col(id_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    return [list(r["_qv"]) for r in rows]


def assign_int(
    df: DataFrame,
    centroids: List[List[int]],
    qvec_col: str = "_qv",
    out_col: str = "_centroid",
) -> DataFrame:
    """argmin integer squared distance to the centroid model; ties take the
    lowest index (numpy argmin and the SQL row_number tie-break agree).
    Arrow-batched exact int64 arithmetic."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.int64)  # (k, dim)
    c2 = (C * C).sum(axis=1)  # (k,)

    @pandas_udf("int")
    def _argmin(vecs: pd.Series) -> pd.Series:
        # |x-c|^2 = |x|^2 + |c|^2 - 2 x.c — matmul form stays exact in
        # int64 (quantized coords bound every term far below 2^63) and
        # avoids the (batch, k, dim) broadcast temp, which at k=sqrt(n)
        # would dominate executor memory
        m = np.vstack(vecs.to_numpy()).astype(np.int64)  # (batch, dim)
        d = (m * m).sum(axis=1)[:, None] + c2[None, :] - 2 * (m @ C.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return df.withColumn(out_col, _argmin(F.col(qvec_col)))


def ivf_search_portable(
    df: DataFrame,
    query_vec,
    centroids: List[List[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probes: int = 4,
    scale: int = 1000,
) -> DataFrame:
    """Portable-mode IVF probe: integer centroid model, integer distance
    probe selection, portable sim_micro re-rank. ``query_vec`` is the RAW
    float vector (quantized here with the same rule as the corpus)."""
    from decimal import ROUND_HALF_UP, Decimal

    # same rounding rule as quantize()/the SQL oracle: ties away from zero
    # on the exact double product (Python round() is banker's — wrong here)
    q = [
        int(Decimal(float(x) * scale).quantize(Decimal(1), rounding=ROUND_HALF_UP))
        for x in query_vec
    ]
    dists = [
        (i, sum((a - b) * (a - b) for a, b in zip(q, c)))
        for i, c in enumerate(centroids)
    ]
    probes = [i for i, _ in sorted(dists, key=lambda t: (t[1], t[0]))[:n_probes]]
    qn2 = sum(x * x for x in q)
    qlit = F.array(*[F.lit(x).cast("long") for x in q])
    base = df.select(
        F.col(id_col), quantize(F.col(vec_col), scale).alias("_qv")
    )
    assigned = assign_int(base, centroids).filter(F.col("_centroid").isin(probes))
    scored = assigned.select(
        F.col(id_col),
        sim_micro_columns(
            F.col("_qv"), qlit, q_dot(F.col("_qv"), F.col("_qv")), F.lit(qn2).cast("long")
        ).alias("sim_micro"),
    ).filter(F.col("sim_micro").isNotNull())
    return scored.orderBy(F.col("sim_micro").desc(), F.col(id_col)).limit(k)


def pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_codes: int = 16,
    sub_dim: int = 8,
    scale: int = 1000,
) -> List[List[List[int]]]:
    """Product-quantization codebooks, portable mode: the quantized
    subvectors of the ``n_codes`` rows with the smallest md5(id) form one
    shared seed set, sliced per subspace — (n_subspaces, n_codes, sub_dim)
    integers. Same md5-order seeding as ``portable_seed_centroids`` (and
    the same trade: no Lloyd refinement, so a SQL oracle reproduces the
    model bit-for-bit; one bounded k-row collect = model fitting)."""
    rows = (
        df.select(quantize(F.col(vec_col), scale).alias("_qv"), F.col(id_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_codes)
        .collect()
    )
    if len(rows) < n_codes:
        # a silently smaller codebook would make codes range over fewer
        # values than callers/oracles assume (and an empty input would
        # IndexError on seeds[0] below) — fail loudly like the sub_dim check
        raise ValueError(
            f"pq_codebooks needs at least n_codes={n_codes} rows, got {len(rows)}"
        )
    seeds = [list(r["_qv"]) for r in rows]
    dim = len(seeds[0])
    if dim % sub_dim:
        raise ValueError(f"dim {dim} is not divisible by sub_dim {sub_dim}")
    return [
        [s[m * sub_dim : (m + 1) * sub_dim] for s in seeds]
        for m in range(dim // sub_dim)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: List[List[List[int]]],
    vec_col: str = "embedding",
    out_col: str = "_codes",
    scale: int = 1000,
) -> DataFrame:
    """argmin-per-subspace PQ encoding -> array<int> of code indices (ties
    take the lowest code, matching the oracle's row_number tie-break).
    Arrow-batched exact int64 matmul per subspace. At 100 TB this is the
    one-off compression pass: downstream search scans M small ints per
    vector instead of the raw floats."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    Cs = [np.asarray(cb, dtype=np.int64) for cb in codebooks]  # m x (k, sd)
    c2s = [(C * C).sum(axis=1) for C in Cs]
    sd = Cs[0].shape[1]

    @pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.int64)  # (batch, dim)
        out = np.empty((m.shape[0], len(Cs)), dtype=np.int32)
        for i, (C, c2) in enumerate(zip(Cs, c2s)):
            sub = m[:, i * sd : (i + 1) * sd]
            d = (sub * sub).sum(axis=1)[:, None] + c2[None, :] - 2 * (sub @ C.T)
            out[:, i] = d.argmin(axis=1)
        return pd.Series(list(out))

    return df.withColumn(out_col, _enc(quantize(F.col(vec_col), scale)))


def pq_adc_table(
    query_vec: Sequence[float],
    codebooks: List[List[List[int]]],
    scale: int = 1000,
) -> List[List[int]]:
    """Exact integer asymmetric-distance table: dt[m][k] = squared L2
    distance between the query's m-th quantized subvector and code k.
    Driver-side and tiny (n_subspaces x n_codes); the query is quantized
    with the same round-half-away rule as the corpus/oracle."""
    from decimal import ROUND_HALF_UP, Decimal

    q = [
        int(Decimal(float(x) * scale).quantize(Decimal(1), rounding=ROUND_HALF_UP))
        for x in query_vec
    ]
    sd = len(codebooks[0][0])
    return [
        [
            sum((a - b) * (a - b) for a, b in zip(q[m * sd : (m + 1) * sd], code))
            for code in cb
        ]
        for m, cb in enumerate(codebooks)
    ]


def pq_search(
    df: DataFrame,
    query_vec: Sequence[float],
    codebooks: List[List[List[int]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    scale: int = 1000,
    codes_col: Optional[str] = None,
) -> DataFrame:
    """PQ top-k by ADC: encode (or reuse ``codes_col`` from a pre-encoded
    table), then score each row as sum over subspaces of a distance-table
    lookup — pure JVM higher-order functions over the code array, no
    Python in the scoring path, followed by a k-row ordered take
    (TakeOrderedAndProject). The scan reads only (id, codes): at scale
    the raw vectors are never touched after the one-off encode."""
    dt = pq_adc_table(query_vec, codebooks, scale)
    dt_lit = F.array(
        *[F.array(*[F.lit(int(v)).cast("long") for v in row]) for row in dt]
    )
    if codes_col is None:
        df = pq_encode(df, codebooks, vec_col=vec_col, scale=scale)
        codes_col = "_codes"
    codes = F.col(codes_col)
    adc = F.aggregate(
        F.sequence(F.lit(1), F.lit(len(dt))),
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(dt_lit, m.cast("int")),
            F.element_at(codes, m.cast("int")) + F.lit(1),
        ),
    )
    return (
        df.select(F.col(id_col), adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col))
        .limit(k)
    )


def semantic_dedup_portable(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids=8,
    threshold_micro: int = 400000,
    scale: int = 1000,
) -> DataFrame:
    """Portable-mode SemDeDup: md5-seeded integer centroids, exact integer
    cluster assignment, within-cluster pairs with sim_micro >=
    threshold_micro, greedy keep-smallest-id. Same cluster-bounded
    quadratic shape as ``semantic_dedup`` (sum of c_i^2, never n^2).
    Pass ``n_centroids="sqrt"`` for the scale path: k tracks sqrt(n), so
    cluster sizes — and with them the pair count per cluster — stay flat
    as the corpus grows (see portable_seed_centroids)."""
    cents = portable_seed_centroids(df, vec_col, id_col, n_centroids, scale)
    base = df.select(F.col(id_col), quantize(F.col(vec_col), scale).alias("_qv"))
    assigned = materialize(
        assign_int(base, cents).withColumn("_n2", q_dot(F.col("_qv"), F.col("_qv")))
    )
    a = assigned.select(
        F.col("_centroid"),
        F.col(id_col).alias("_ida"),
        F.col("_qv").alias("_va"),
        F.col("_n2").alias("_na2"),
    )
    b = assigned.select(
        F.col("_centroid"),
        F.col(id_col).alias("_idb"),
        F.col("_qv").alias("_vb"),
        F.col("_n2").alias("_nb2"),
    )
    pairs = (
        a.join(b, "_centroid")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn(
            "_sm",
            sim_micro_columns(F.col("_va"), F.col("_vb"), F.col("_na2"), F.col("_nb2")),
        )
        .filter(F.col("_sm") >= threshold_micro)
    )
    losers = pairs.select(F.col("_idb").alias(id_col)).dropDuplicates()
    return df.join(losers, id_col, "left_anti")


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    threshold: float = 0.4,
    iterations: int = 2,
    train_fraction: Optional[float] = None,
    max_train_rows: Optional[int] = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space
    with k-means, then compare pairs ONLY within a cluster and drop every
    row whose cosine similarity to a smaller-id cluster-mate exceeds the
    threshold (greedy keep-first, same policy as ``dedup.cosine_dedup``).

    This is the scale path for embedding dedup that complements the LSH
    bucket variant: the quadratic pair work is bounded per cluster
    (sum of c_i^2 instead of n^2), clusters are an equi-join key, and the
    centroid model is a tiny driver-side list — the assignment is one
    Arrow-batched matmul over the scan. Near-duplicates split across two
    clusters are missed by construction; recall vs the exact pair set is
    measured in tests (mirrors the LSH-recall discipline).
    """
    cents = ivf_train_centroids(
        df,
        vec_col,
        id_col,
        n_centroids,
        iterations,
        train_fraction,
        max_train_rows,
    )
    # unit-normalize ONCE per row (zero vectors -> null, never a pair), so
    # the quadratic stage pays one dot product per pair instead of a dot
    # plus two norms
    v = as_double(F.col(vec_col))
    n = norm(v)
    unit = F.when(n != 0, F.transform(v, lambda x: x / n))
    assigned = materialize(
        _assign(df, vec_col, cents).select(
            F.col(id_col), unit.alias("_v"), "_centroid"
        )
    ).filter(F.col("_v").isNotNull())
    a = assigned.select(
        F.col("_centroid"), F.col(id_col).alias("id_a"), F.col("_v").alias("_va")
    )
    b = assigned.select(
        F.col("_centroid"), F.col(id_col).alias("id_b"), F.col("_v").alias("_vb")
    )
    pairs = (
        a.join(b, "_centroid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_sim", dot(F.col("_va"), F.col("_vb")))
        .filter(F.col("_sim") >= threshold)
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
    return df.join(losers, id_col, "left_anti")
