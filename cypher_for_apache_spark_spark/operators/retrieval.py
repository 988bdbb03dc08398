"""Bag-of-words retrieval scoring for corpus curation.

BM25 against a fixed query term set — the workhorse for "find documents
like these benchmark seeds" / quality-by-query curation passes over a
training corpus. Pure JVM expressions with a deterministic arithmetic
definition, so a DuckDB oracle reproduces scores exactly.

Scale design: tokens are filtered to the query's terms BEFORE any
aggregation (the explode's output is immediately semi-filtered by a
literal IN list, so the shuffle carries only query-term hits); document
lengths are one map-side-combinable count; the per-term document
frequencies and the average document length are a |terms|-row /
scalar broadcast. Nothing quadratic, no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from cypher_for_apache_spark_spark.operators.text import normalize_text


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) — classic BM25 (Robertson/Sparck Jones idf with +1
    smoothing) of every document containing at least one query term.

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    """
    terms = sorted(set(query_terms))
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), r"\s+")).alias("term"),
    )
    doclen = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    n_and_avg = doclen.agg(
        F.count("*").alias("N"), F.avg("dl").alias("avgdl")
    )
    hits = toks.filter(F.col("term").isin(list(terms)))
    tf = hits.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = dfreq.crossJoin(F.broadcast(n_and_avg)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("N") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(doclen, id_col)
        .select(
            F.col(id_col),
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_s").alias("score"))
