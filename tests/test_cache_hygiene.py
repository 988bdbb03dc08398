"""Cache-hygiene regression tests (round-2 defect): operators that
materialize fan-out intermediates must not accumulate storage across
repeated calls in a long-lived session.

``materialize`` uses eager localCheckpoint, whose blocks the
ContextCleaner frees once the last reference is garbage-collected —
unlike the old ``persist()`` calls, which registered CacheManager entries
that lived forever (one MORE per operator call). The tests therefore
assert two things:

1. the CacheManager stays empty (the exact round-2 leak vector), and
2. after running each operator REPEATEDLY and dropping all references,
   the persistent-RDD count returns to (near) the pre-run baseline —
   a small tolerance (REPEATS - 1) absorbs references transiently
   pinned by the test process that the asynchronous ContextCleaner
   hasn't freed yet, while still catching per-call accumulation: the
   round-2 behavior pinned at least one frame per operator call
   (>= REPEATS frames per test), forever.
"""

import gc
import time

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
REPEATS = 3


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _assert_no_cache_entries(spark):
    """The round-2 leak vector: persist() registered frames in the
    CacheManager, where they lived until an explicit unpersist. Scoped
    materialization must never touch the CacheManager at all."""
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _drain(spark, baseline: int, attempts: int = 40) -> int:
    """GC until the persistent-RDD count drops to the baseline (the
    ContextCleaner processes weak references asynchronously, so give it
    generous time before declaring a leak)."""
    for _ in range(attempts):
        gc.collect()
        spark._jvm.System.gc()
        if _n_persistent(spark) <= baseline:
            break
        time.sleep(0.5)
    return _n_persistent(spark)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_dedup_operators_release_storage(spark, docs):
    from cypher_for_apache_spark_spark.operators.dedup import (
        minhash_dedup,
        ngram_jaccard_pairs,
        simhash,
        simhash_pairs,
    )

    baseline = _n_persistent(spark)
    # counts computed OUTSIDE the assert expressions: pytest's assertion
    # rewriting would otherwise hold the DataFrames in frame locals for the
    # rest of the test, pinning their checkpointed storage
    for _ in range(REPEATS):
        n_dedup = minhash_dedup(docs, num_hashes=16, bands=4).count()
        n_ngram = ngram_jaccard_pairs(docs, threshold=0.5).count()
        n_simhash = simhash_pairs(simhash(docs), max_distance=3).count()
        assert n_dedup > 0 and n_ngram >= 0 and n_simhash >= 0
    _assert_no_cache_entries(spark)
    # r2 behavior would leave >= 4 * REPEATS CacheManager frames here
    assert _drain(spark, baseline) <= baseline + REPEATS - 1


def test_lsh_candidates_release_storage(spark, emb):
    from cypher_for_apache_spark_spark.operators.similarity import knn_join_lsh

    baseline = _n_persistent(spark)
    for _ in range(REPEATS):
        n = knn_join_lsh(emb, k=3, bands=2).count()
        assert n > 0
    _assert_no_cache_entries(spark)
    assert _drain(spark, baseline) <= baseline + REPEATS - 1


def test_varlength_scan_releases_storage(session, spark):
    import __spark_entry__ as E

    # load (and memoize) the graph AND run the query once first: the
    # graph's triplet/derived-rel tables are columnar persist() caches
    # that live exactly as long as the graph object — by design (they are
    # the graph's materialized views, and CacheManager entries here are
    # intentional, unlike the per-call operator caches above). The warmup
    # materializes them so the baseline below captures graph-lifetime
    # storage; the leak under test is per-QUERY storage on top of it.
    g = E._graph(spark, SF_DIR)
    query = """MATCH (a:Customer)-[:PLACED|NEXT*1..3]->(x)
               RETURN count(*) AS n"""
    g.cypher(query).df.count()
    baseline = _n_persistent(spark)
    for _ in range(REPEATS):
        out = g.cypher(query).df
        n = out.count()
        del out
        assert n == 1
    del g
    assert _drain(spark, baseline) <= baseline + REPEATS - 1


def test_materialize_reuses_single_computation(spark):
    """materialize() must compute its input exactly once (the recompute
    guard the old persist+count idiom provided)."""
    from pyspark.sql import types as T

    from cypher_for_apache_spark_spark.materialize import materialize

    calls = spark.sparkContext.accumulator(0)

    def bump(x):
        calls.add(1)
        return x

    bump_udf = F.udf(bump, T.LongType())
    base = spark.range(0, 100, 1, 2).select(bump_udf("id").alias("id"))
    m = materialize(base)
    assert calls.value == 100  # eager: computed once up front
    # two downstream branches: no recompute of the source
    m.filter("id % 2 = 0").count()
    m.filter("id % 2 = 1").count()
    assert calls.value == 100
