"""BM25: reference-formula equivalence on a small corpus + plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.retrieval import bm25_scores


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark makes tables fast"),
        (1, "spark spark spark everywhere"),
        (2, "tables of data and more data"),
        (3, "nothing relevant here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _reference_bm25(rows, terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in rows}
    N = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / N
    out = {}
    for term in set(terms):
        df_t = sum(1 for t in docs.values() if term in t)
        if df_t == 0:
            continue
        idf = math.log(1 + (N - df_t + 0.5) / (df_t + 0.5))
        for i, toks in docs.items():
            tf = toks.count(term)
            if tf:
                out[i] = out.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
    return out


def test_bm25_matches_reference(corpus):
    terms = ["spark", "tables"]
    got = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, terms).collect()}
    want = _reference_bm25(
        [(r["doc_id"], r["text"]) for r in corpus.collect()], terms
    )
    assert set(got) == set(want)  # doc 3 has no hits: absent
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_ranks_tf_and_idf_sensibly(corpus):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["spark"]).collect()}
    assert got[1] > got[0]  # higher tf wins under same idf
    rare = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["everywhere"]).collect()}
    common = {r["doc_id"]: r["score"] for r in bm25_scores(corpus, ["spark"]).collect()}
    assert rare[1] > common[1]  # rarer term carries more idf weight


def test_bm25_plan_broadcasts_stats(corpus):
    plan = (
        bm25_scores(corpus, ["spark", "tables"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # idf/avgdl reach the tf rows via broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
