"""End-to-end training-corpus preparation on DataFrames.

The data-pipeline analogue of the reference's Customer360Example — but for
the LLM-corpus workload this engine adds beyond the reference: quality
gates, corpus-level dedup, deterministic splitting, and token chunking,
composed as plain DataFrame stages.
"""

from __future__ import annotations

from cypher_for_apache_spark_spark.operators.dedup import exact_dedup
from cypher_for_apache_spark_spark.operators.sampling import hash_split
from cypher_for_apache_spark_spark.operators.text import (
    chunk_tokens,
    classifier_score,
    gopher_filter,
)


def run(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again ok"),
            (2, "the quick brown fox jumps over the lazy dog again and again ok"),
            (3, "spam spam spam spam spam spam spam spam spam spam spam spam"),
            (4, "a genuinely informative document about property graph engines "
                "running cypher queries on spark dataframes with catalyst plans"),
        ],
        "doc_id long, text string",
    )

    # 1. quality gate (Gopher rules: length / repetition / symbol ratios)
    quality = gopher_filter(docs, min_tokens=10)
    assert 3 not in {r["doc_id"] for r in quality.select("doc_id").collect()}

    # 2. exact dedup (md5 content key, keep smallest id)
    unique = exact_dedup(quality)
    ids = {r["doc_id"] for r in unique.select("doc_id").collect()}
    assert 2 not in ids and 1 in ids

    # 3. model-based scoring joins in as one shuffle-free projection
    scored = unique.join(classifier_score(unique), "doc_id")
    assert scored.filter("clf_score < 0 OR clf_score > 1").count() == 0

    # 4. deterministic split + fixed-size token chunks for the trainer
    splits = hash_split(scored, "doc_id", {"train": 0.9, "val": 0.1})
    chunks = chunk_tokens(splits.filter("split = 'train'"), chunk_size=8)
    assert chunks.filter("n_tokens > 8").count() == 0
    assert chunks.count() > 0


if __name__ == "__main__":
    from _common import main

    main(run)
