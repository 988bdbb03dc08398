"""Data selection for LLM training corpora: DSIR importance resampling.

DSIR (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023) picks raw-corpus documents whose hashed n-gram
distribution looks like a small *target* corpus: featurize every document
as hashed unigram+bigram counts over ``buckets`` buckets, fit two add-one-
smoothed bag-of-buckets models (target vs raw), weight each raw document
by its log-likelihood ratio, and sample without replacement via Gumbel
top-k — equivalent to importance resampling.

Beyond the reference's surface (it has no data-selection pipeline).

Scale design (100 TB raw corpus):
- Featurization is explode -> 8-byte hash -> bucket: the shuffle key is an
  int bucket id, and per-(doc,bucket) counts are map-side combinable.
- Both models are ``buckets``-row tables (default 4096) — broadcast joins;
  the raw corpus is never joined against anything corpus-sized.
- Every decisive quantity is an exact integer: per-bucket log-ratios are
  quantized to integer micro-units ONCE (a ``buckets``-row frame), then
  per-document weights are integer dot-products — summation order cannot
  drift the result, so a DuckDB oracle reproduces weights bit-for-bit.
- The Gumbel key derives from md5 of the document id (deterministic,
  cross-engine reproducible); ties break on doc id.

No Python UDFs anywhere — built-in functions and one explode per n-gram
order.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from cypher_for_apache_spark_spark.operators.text import (
    normalize_text,
    portable_hash60,
)

MICRO = 1_000_000


def _gram_buckets(df: DataFrame, text_col: str, id_col: str, buckets: int) -> DataFrame:
    """(id, bucket) rows: one per unigram and bigram occurrence. Hashing is
    the portable 60-bit md5 prefix so oracles can reproduce bucket ids.

    The token array is HOISTED into its own projection before the bigram
    lambda references it: HOF lambdas are interpreted (CodegenFallback, no
    common-subexpression reuse), so an outer normalize+split+filter
    expression inside ``element_at`` would re-tokenize the document once
    per bigram — O(tokens^2) regex work (measured 19.8 s for sf1 DSIR
    weights; ~6 s hoisted). Same trap ``shingle_hash_rows`` documents."""
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != "")
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    tc = F.col("_toks")
    # unigrams ++ bigrams ("w1 w2"), built inside one projection
    bigrams = F.when(
        F.size(tc) >= 2,
        F.transform(
            F.slice(tc, 1, F.size(tc) - 1),
            lambda w, i: F.concat(w, F.lit(" "), F.element_at(tc, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(tc, bigrams)
    return (
        base.select("_id", F.explode(grams).alias("_gram"))
        .select("_id", F.pmod(portable_hash60(F.col("_gram")), F.lit(buckets)).alias("_b"))
    )


def _bucket_totals(grams: DataFrame) -> DataFrame:
    """buckets-row frame of per-bucket occurrence counts."""
    return grams.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))


def dsir_log_ratio_table(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    raw_bucket_counts: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-bucket integer micro log-likelihood ratio table
    (_b, lr_micro): round(1e6 * [ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))]).

    The table has at most ``buckets`` rows — broadcast-sized regardless of
    corpus size. Buckets unseen in either model still carry the smoothed
    ratio, so the frame enumerates all ``buckets`` ids via ``sequence``.
    ``raw_bucket_counts`` ((_b, _c) occurrence totals) lets
    ``dsir_importance_weights`` share one featurization of the raw corpus
    between model fit and document scoring (hashing the grams is the
    dominant cost)."""
    t_counts = _bucket_totals(_gram_buckets(target_df, text_col, id_col, buckets))
    if raw_bucket_counts is None:
        raw_bucket_counts = _bucket_totals(
            _gram_buckets(raw_df, text_col, id_col, buckets)
        )
    r_counts = raw_bucket_counts
    spark = raw_df.sparkSession
    all_b = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("_b")
    )
    t_tot = t_counts.agg(F.sum("_c").alias("_T"))
    r_tot = r_counts.agg(F.sum("_c").alias("_R"))
    joined = (
        all_b.join(F.broadcast(t_counts.withColumnRenamed("_c", "_tc")), "_b", "left")
        .join(F.broadcast(r_counts.withColumnRenamed("_c", "_rc")), "_b", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
    )
    tc = F.coalesce(F.col("_tc"), F.lit(0)).cast("double")
    rc = F.coalesce(F.col("_rc"), F.lit(0)).cast("double")
    T = F.coalesce(F.col("_T"), F.lit(0)).cast("double")
    R = F.coalesce(F.col("_R"), F.lit(0)).cast("double")
    lr = (
        F.log(tc + F.lit(1.0))
        - F.log(T + F.lit(float(buckets)))
        - F.log(rc + F.lit(1.0))
        + F.log(R + F.lit(float(buckets)))
    )
    return joined.select(
        "_b", F.round(lr * MICRO).cast("long").alias("lr_micro")
    )


def dsir_importance_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    ratio_table: Optional[DataFrame] = None,
) -> DataFrame:
    """(id_col, weight_micro) for every raw document: the integer dot
    product of the document's bucket counts with the per-bucket micro
    log-ratios. Documents with no grams (empty text) weight 0.

    ``ratio_table`` lets callers reuse a precomputed/persisted model (the
    normal production shape: fit once, score many shards)."""
    if ratio_table is None:
        # featurize the raw corpus ONCE: the per-(doc,bucket) counts feed
        # both the raw model's bucket totals (a second-level aggregation)
        # and the per-document scoring join
        from cypher_for_apache_spark_spark.materialize import materialize

        doc_buckets = materialize(
            _gram_buckets(raw_df, text_col, id_col, buckets)
            .groupBy("_id", "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        ratio_table = dsir_log_ratio_table(
            raw_df,
            target_df,
            text_col,
            id_col,
            buckets,
            raw_bucket_counts=doc_buckets.groupBy("_b").agg(
                F.sum("_c").alias("_c")
            ),
        )
    else:
        doc_buckets = (
            _gram_buckets(raw_df, text_col, id_col, buckets)
            .groupBy("_id", "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
    scored = (
        doc_buckets.join(F.broadcast(ratio_table), "_b")
        .groupBy("_id")
        .agg(F.sum(F.col("_c") * F.col("lr_micro")).alias("weight_micro"))
    )
    return raw_df.select(F.col(id_col)).join(
        scored.withColumnRenamed("_id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce(F.col("weight_micro"), F.lit(0)).cast("long").alias("weight_micro"),
    )


def _gumbel_micro(id_col: Column) -> Column:
    """Deterministic integer micro-Gumbel from md5 of the id: u in (0,1)
    from the top 32 bits of md5, g = -ln(-ln(u)). Cross-engine: DuckDB
    computes the identical value from the same md5 prefix."""
    u32 = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    u = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    return F.round(-F.log(-F.log(u)) * MICRO).cast("long")


def dsir_resample(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k importance resampling: keep the ``k`` raw documents
    with the largest ``weight_micro / temperature + gumbel_micro`` key —
    without-replacement sampling proportional to exp(weight/temperature).
    Deterministic (md5-seeded Gumbel, doc-id tiebreak), so the selection
    is testable and restart-safe. Returns (id, weight_micro, key_micro)
    ordered by the key.

    Top-k is ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (per-
    partition heaps + a k-row driver merge), no global sort at scale."""
    w = dsir_importance_weights(raw_df, target_df, text_col, id_col, buckets)
    key = (
        F.round(F.col("weight_micro") / F.lit(temperature)).cast("long")
        + _gumbel_micro(F.col(id_col))
    ).alias("key_micro")
    return (
        w.select(id_col, "weight_micro", key)
        .orderBy(F.col("key_micro").desc(), F.col(id_col))
        .limit(k)
    )
