"""Engine-internal verification for the two rows-only registry twins
(dedup_minhash_docs, dedup_simhash_pairs): their xxhash64 fast paths
cannot be DuckDB-oracled, but they must agree with the fully
hash-verified md5 *_portable twins at identical parameters.

What is PROVABLE: a pair with identical normalized shingle/token content
has identical minhash signatures / simhash fingerprints under EITHER
hash family — every band collides, distance is 0 — so both modes must
surface it, with jaccard_est = 1 / hamming = 0. NEAR-duplicate pairs are
where the families may legitimately diverge: banding collisions and
simhash bit votes are hash-family-specific, so a pair sitting near the
s-curve knee / distance cutoff can pass in one family and miss in the
other. The tests therefore assert
  (1) full pair-set agreement on corpora of exact duplicates + disjoint
      noise (deterministic for the seeds; catches drift of either path),
  (2) on corpora WITH near-duplicates: the provable exact subset always
      survives in both modes, and any cross-family disagreement is
      confined to near-duplicate ids (the documented divergence)."""

import random

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators import dedup

WORDS = (
    "spark shuffle partition join broadcast filter column parquet stream "
    "window sketch sample cluster vector token corpus model batch merge "
    "graph node edge path label index scan hash sort spill codegen plan"
).split()


def _corpus(spark, rng, n_groups=6, dups_per_group=3, n_noise=10, near=0):
    """Deterministic corpus: exact-duplicate groups + unrelated noise +
    optional near-duplicate pairs (one word swapped at the tail).
    Returns (df, exact_pairs, near_ids)."""
    rows = []
    did = 0
    expected_pairs = set()
    for g in range(n_groups):
        text = " ".join(rng.choice(WORDS) for _ in range(30))
        ids = []
        for _ in range(dups_per_group):
            rows.append((did, text))
            ids.append(did)
            did += 1
        for a in ids:
            for b in ids:
                if a < b:
                    expected_pairs.add((a, b))
    near_ids = set()
    for _ in range(near):
        base = [rng.choice(WORDS) for _ in range(30)]
        rows.append((did, " ".join(base)))
        near_ids.add(did)
        did += 1
        base[-1] = rng.choice(WORDS)
        rows.append((did, " ".join(base)))
        near_ids.add(did)
        did += 1
    for _ in range(n_noise):
        # disjoint vocabulary so noise shares no shingles with the groups
        rows.append((did, " ".join(f"tok{rng.randrange(10**6)}" for _ in range(30))))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df, expected_pairs, near_ids


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


@pytest.mark.parametrize("seed", [7, 23])
def test_minhash_modes_agree_without_near_pairs(spark, seed):
    # registry params of the two minhash entries: fast (32, 8, 0.8) and
    # portable (16, 4, 0.5) — run BOTH param sets under BOTH hash modes
    rng = random.Random(seed)
    docs, exact, _ = _corpus(spark, rng)
    for num_hashes, bands, thr in ((32, 8, 0.8), (16, 4, 0.5)):
        got = {}
        for mode in ("xxhash64", "md5"):
            out = dedup.minhash_duplicate_pairs(
                docs,
                num_hashes=num_hashes,
                bands=bands,
                threshold=thr,
                hash_mode=mode,
            )
            got[mode] = _pairs(out)
            # provable: exact-duplicate pairs survive under any hash family
            assert exact <= got[mode], (mode, num_hashes, bands, thr)
        assert got["xxhash64"] == got["md5"], (num_hashes, bands, thr)


@pytest.mark.parametrize("seed", [11, 37])
def test_minhash_near_pair_divergence_is_confined(spark, seed):
    rng = random.Random(seed)
    docs, exact, near_ids = _corpus(spark, rng, near=4)
    got = {}
    surv = {}
    for mode in ("xxhash64", "md5"):
        got[mode] = _pairs(
            dedup.minhash_duplicate_pairs(
                docs, num_hashes=32, bands=8, threshold=0.8, hash_mode=mode
            )
        )
        assert exact <= got[mode], mode
        surv[mode] = {
            r["doc_id"]
            for r in dedup.minhash_dedup(
                docs, num_hashes=32, bands=8, threshold=0.8, hash_mode=mode
            ).collect()
        }
    # any cross-family disagreement involves a near-duplicate id — the
    # documented divergence; exact groups and noise never flip
    for a, b in got["xxhash64"] ^ got["md5"]:
        assert a in near_ids or b in near_ids, (a, b)
    for d in surv["xxhash64"] ^ surv["md5"]:
        assert d in near_ids, d


@pytest.mark.parametrize("seed", [11, 37])
def test_minhash_dedup_survivors_agree_without_near_pairs(spark, seed):
    rng = random.Random(seed)
    docs, _, _ = _corpus(spark, rng)
    surv = {}
    for mode in ("xxhash64", "md5"):
        surv[mode] = {
            r["doc_id"]
            for r in dedup.minhash_dedup(
                docs, num_hashes=32, bands=8, threshold=0.8, hash_mode=mode
            ).collect()
        }
    assert surv["xxhash64"] == surv["md5"]


@pytest.mark.parametrize("seed", [13, 41])
def test_simhash_modes_agree_without_near_pairs(spark, seed):
    rng = random.Random(seed)
    docs, exact, _ = _corpus(spark, rng)
    got = {}
    for mode in ("xxhash64", "md5"):
        fp = dedup.simhash(docs, hash_mode=mode)
        out = dedup.simhash_pairs(fp, max_distance=3, chunks=4)
        got[mode] = _pairs(out)
        assert exact <= got[mode], mode
        zero = _pairs(out.filter(F.col("hamming") == 0))
        # provable: identical token content -> identical fingerprint ->
        # distance 0 under any hash family
        assert exact <= zero, mode
    assert got["xxhash64"] == got["md5"]


@pytest.mark.parametrize("seed", [13, 41])
def test_simhash_near_pair_divergence_is_confined(spark, seed):
    rng = random.Random(seed)
    docs, exact, near_ids = _corpus(spark, rng, near=4)
    got = {}
    for mode in ("xxhash64", "md5"):
        fp = dedup.simhash(docs, hash_mode=mode)
        got[mode] = _pairs(dedup.simhash_pairs(fp, max_distance=3, chunks=4))
        assert exact <= got[mode], mode
    for a, b in got["xxhash64"] ^ got["md5"]:
        assert a in near_ids or b in near_ids, (a, b)
