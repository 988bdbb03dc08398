"""Hot-bucket cap for MinHash LSH banding (VERDICT r6 task #1).

A boilerplate-heavy corpus puts most documents into ONE band bucket; the
uncapped (band, bucket) self-join then emits O(k^2) candidate pairs. These
tests build exactly that corpus (90% near-duplicates of one base text, all
with DISTINCT signatures so the sig-equal collapse can't route around the
join) and assert:

- the capped candidate count is bounded by bands * C(cap, 2) while the
  uncapped count is quadratic;
- recall vs the uncapped pair set is measured, and a non-binding cap
  reproduces the uncapped set exactly;
- both dedup policies produce identical survivor sets under a non-binding
  cap, and still collapse the hot cluster under a binding one;
- the skew shape from tests/test_skew.py: half the corpus in one bucket
  stays bounded end-to-end.
"""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators import dedup


WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu one two three four five six seven eight nine "
    "ten eleven twelve thirteen fourteen"
).split()


def _hot_corpus(spark, n_dups=90, n_unique=10):
    """n_dups one-word perturbations of a base text (near-dups, distinct
    texts) + n_unique unrelated docs."""
    rows = []
    for i in range(n_dups):
        toks = list(WORDS)
        toks[i % len(toks)] = f"tok{i}"
        rows.append((i, " ".join(toks)))
    for j in range(n_unique):
        rows.append(
            (n_dups + j, " ".join(f"uniq{j}w{k}" for k in range(30)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def hot(spark):
    return _hot_corpus(spark)


@pytest.fixture(scope="module")
def hot_sigs(hot):
    from cypher_for_apache_spark_spark.materialize import materialize

    return materialize(dedup.minhash_signatures(hot, num_hashes=32))


def _pairs(sigs, max_bucket):
    return {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            sigs, bands=8, num_hashes=32, max_bucket=max_bucket
        ).collect()
    }


def test_corpus_signatures_are_distinct(hot_sigs, hot):
    # precondition: the sig-equal collapse cannot absorb this corpus —
    # the quadratic pressure really lands on the band join
    n = hot.count()
    assert hot_sigs.select("signature").distinct().count() >= n - 5


def _banded(sigs, bands=8, r=4):
    return sigs.select(
        F.col("doc_id").alias("_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("signature"), b * r + 1, r).cast("string")
                    ).alias("bucket"),
                ),
            )
        ).alias("_bb"),
    ).select("_id", "_bb.band", "_bb.bucket")


def test_cap_bounds_bucket_membership(hot_sigs):
    """The stage-input bound itself: after _cap_buckets no (band, bucket)
    group exceeds the cap, while the raw banding has a hot bucket holding
    >=half the near-dup cluster."""
    banded = _banded(hot_sigs)
    raw_max = (
        banded.groupBy("band", "bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert raw_max >= 45  # the skew: one bucket holds >= half the cluster
    capped = dedup._cap_buckets(banded, 8, "xxhash64")
    cap_max = (
        capped.groupBy("band", "bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert cap_max <= 8


def test_cap_bounds_quadratic_bucket(hot_sigs):
    uncapped = _pairs(hot_sigs, None)
    capped = _pairs(hot_sigs, 8)
    # 90 near-dups sharing buckets: the uncapped join is quadratic
    assert len(uncapped) > 1000
    # analytic bound: each (band, bucket) group of size k contributes at
    # most C(min(k, cap), 2) pairs
    sizes = [
        r["count"]
        for r in _banded(hot_sigs).groupBy("band", "bucket").count().collect()
    ]
    bound = sum(min(k, 8) * (min(k, 8) - 1) // 2 for k in sizes)
    assert len(capped) <= bound < len(uncapped)
    # the cap is a subset sample, never an invention
    assert capped <= uncapped
    recall = len(capped) / len(uncapped)
    assert 0 < recall < 1  # binding cap: measured, lossy, bounded


def test_non_binding_cap_is_exact(hot_sigs):
    assert _pairs(hot_sigs, 4096) == _pairs(hot_sigs, None)


def test_capped_plan_has_bucket_window(hot_sigs):
    plan = dedup.lsh_candidate_pairs(
        hot_sigs, bands=8, num_hashes=32, max_bucket=8
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan and "Window" in plan


def test_dedup_survivors_match_under_non_binding_cap(hot):
    exact = {
        r["doc_id"]
        for r in dedup.minhash_dedup(hot, threshold=0.5, max_bucket=None).collect()
    }
    capped = {
        r["doc_id"]
        for r in dedup.minhash_dedup(hot, threshold=0.5, max_bucket=4096).collect()
    }
    assert exact == capped


def test_cc_survivors_match_under_non_binding_cap(hot):
    exact = {
        r["doc_id"]
        for r in dedup.minhash_dedup_cc(hot, threshold=0.5, max_bucket=None).collect()
    }
    capped = {
        r["doc_id"]
        for r in dedup.minhash_dedup_cc(hot, threshold=0.5, max_bucket=4096).collect()
    }
    assert exact == capped


def test_binding_cap_still_collapses_hot_cluster(hot):
    """Skew shape (tests/test_skew.py family): >50% of the corpus in one
    band bucket. With a binding cap the pipeline stays bounded AND still
    removes duplicates inside the sampled window; uniques always survive."""
    out = {
        r["doc_id"]
        for r in dedup.minhash_dedup_cc(hot, threshold=0.5, max_bucket=16).collect()
    }
    uniques = set(range(90, 100))
    assert uniques <= out  # never touches the cold docs
    assert len(out) < 100  # the hot cluster shrank
    # bounded candidate stage: the verification join's input is the capped
    # pair set, already asserted <= bands * C(cap,2) above


def test_md5_cap_ordering_is_portable(hot):
    """md5 mode orders the bucket sample by the portable 60-bit hash, so a
    binding cap is reproducible outside Spark. Here: the md5 pipeline stays
    internally consistent (same call twice = same pairs) and distinct from
    nothing — determinism is the contract."""
    sigs = dedup.minhash_signatures(hot, num_hashes=16, hash_mode="md5")
    p1 = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, hash_mode="md5", max_bucket=8
        ).collect()
    }
    p2 = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            sigs, bands=4, num_hashes=16, hash_mode="md5", max_bucket=8
        ).collect()
    }
    assert p1 == p2 and p1


def test_incremental_cap_non_binding_matches_exact(spark, hot):
    store = dedup.minhash_signatures(
        hot.filter(F.col("doc_id") < 50), num_hashes=32
    )
    batch = hot.filter(F.col("doc_id") >= 50)
    s_exact, _ = dedup.minhash_dedup_incremental(
        batch, store, threshold=0.5, max_bucket=None
    )
    s_capped, _ = dedup.minhash_dedup_incremental(
        batch, store, threshold=0.5, max_bucket=4096
    )
    assert {r["doc_id"] for r in s_exact.collect()} == {
        r["doc_id"] for r in s_capped.collect()
    }
