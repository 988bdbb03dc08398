"""Benchmark-contamination detection for training corpora.

The standard decontamination question: for each *benchmark* document, what
fraction of its n-grams also occurs anywhere in the *training* corpus?
(High overlap => the benchmark leaked into training data; the doc — or the
training near-matches — must be dropped before eval numbers mean anything.)

Scale design: grams travel as 8-byte xxhash64 values (see
``dedup.shingle_hash_rows``), never as strings, so the big join is an
equi-join of longs against a distinct-hash set that is tiny relative to
the corpus (distinct n-grams of the *benchmark*, not the corpus, drive the
output). The training side is one distinct-aggregate over gram hashes —
map-side combinable, shuffles only 8-byte keys. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cypher_for_apache_spark_spark.operators.dedup import shingle_hash_rows


def ngram_contamination(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    mode: str = "word",
) -> DataFrame:
    """Per-benchmark-document contamination report:
    (id, n_grams, n_matched, contamination) where ``contamination`` =
    matched distinct n-grams / total distinct n-grams (0.0 when the doc is
    shorter than n tokens).

    At real scale the distinct-train-gram frame is the large side and the
    exploded benchmark grams the small side — Catalyst/AQE broadcast the
    benchmark side; output is one row per benchmark doc.
    """
    bench_grams = shingle_hash_rows(
        bench_df, text_col, keep=(id_col,), n=n, mode=mode, distinct=True,
        outer=True, out="_g",
    )
    train_grams = (
        shingle_hash_rows(
            train_df, text_col, n=n, mode=mode, distinct=True, out="_g"
        )
        .dropDuplicates()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        bench_grams.join(train_grams, "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count("_g").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
    )
    return per_doc.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_matched").cast("long").alias("n_matched"),
        F.round(
            F.when(F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("contamination"),
    )


def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    mode: str = "word",
    max_overlap: float = 0.0,
) -> DataFrame:
    """Drop TRAINING documents that share more than ``max_overlap`` of
    their distinct n-grams with any benchmark text — the removal step that
    ``ngram_contamination``'s report motivates (decontamination runs
    train-side in every serious pipeline; the report above is bench-side).

    Same scale shape as the report: grams travel as 8-byte hashes, the
    benchmark gram set is the broadcast side, and the per-train-doc
    overlap is one map-side-combinable aggregation. ``max_overlap=0.0``
    drops a doc on ANY shared n-gram."""
    train_grams = shingle_hash_rows(
        train_df, text_col, keep=(id_col,), n=n, mode=mode, distinct=True,
        out="_g",
    )
    bench_grams = (
        shingle_hash_rows(
            bench_df, text_col, n=n, mode=mode, distinct=True, out="_g"
        )
        .dropDuplicates()
        .withColumn("_hit", F.lit(1))
    )
    overlap = (
        train_grams.join(F.broadcast(bench_grams), "_g", "left_outer")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("_total"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("_matched"),
        )
        .filter(F.col("_matched") > F.col("_total") * F.lit(max_overlap))
        .select(id_col)
    )
    return train_df.join(overlap, id_col, "left_anti")
