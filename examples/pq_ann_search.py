"""Product-quantization ANN over the synthetic embeddings table.

The 100 TB embedding-store pattern: compress every vector ONCE to a few
small code integers (pq_codebooks + pq_encode), persist the codes, then
serve top-k queries with pure JVM distance-table lookups over the code
column — the raw floats are never reread at query time. Compares the PQ
answer against exact brute-force cosine to show the approximation.
"""

from __future__ import annotations

import os

from examples._common import main

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run(spark) -> None:
    from cypher_for_apache_spark_spark.operators.similarity import (
        knn_brute,
        pq_codebooks,
        pq_encode,
        pq_search,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # one-off model fit + compression pass (persist `codes` in real use)
    cb = pq_codebooks(emb, n_codes=16, sub_dim=8)
    encoded = pq_encode(emb, cb, out_col="codes").select("vec_id", "codes")

    query = emb.where("vec_id = 0").first()["embedding"]

    print("== PQ top-10 by asymmetric distance (code lookups only)")
    pq_search(
        encoded.where("vec_id <> 0"), query, cb, k=10, codes_col="codes"
    ).show()

    print("== exact cosine top-10 for comparison")
    knn_brute(emb.where("vec_id <> 0"), query, k=10).show()


if __name__ == "__main__":
    main(run)
