"""Tests for PII scan/redact and intra-document repetition metrics."""

import pytest
from pyspark.sql import functions as F

from cypher_for_apache_spark_spark.operators.pii import redact_pii, scan_pii
from cypher_for_apache_spark_spark.operators.text import repetition_stats


@pytest.fixture()
def pii_docs(spark):
    rows = [
        (1, "contact me at alice@example.com or bob.smith+x@mail.co.uk today"),
        (2, "server at 10.0.0.1 serves https://example.com/path?q=1 fine"),
        (3, "ssn 123-45-6789 card 4111 1111 1111 1111 phone +1 (555) 123-4567"),
        (4, "perfectly clean text with no identifiers at all"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scan_pii_counts(spark, pii_docs):
    got = {r["doc_id"]: r.asDict() for r in scan_pii(pii_docs.fillna({"text": ""})).collect()}
    assert got[1]["pii_email"] == 2
    assert got[2]["pii_ipv4"] == 1 and got[2]["pii_url"] == 1
    assert got[3]["pii_ssn"] == 1 and got[3]["pii_credit_card"] >= 1
    assert got[3]["pii_phone"] >= 1
    assert got[4]["pii_total"] == 0


def test_redact_pii_replaces_matches(spark, pii_docs):
    out = {
        r["doc_id"]: r["text"]
        for r in redact_pii(pii_docs.fillna({"text": ""})).collect()
    }
    assert "<EMAIL>" in out[1] and "alice@example.com" not in out[1]
    assert "<URL>" in out[2] and "<IPV4>" in out[2]
    assert "<SSN>" in out[3]
    assert out[4] == "perfectly clean text with no identifiers at all"


def test_redaction_then_scan_is_clean(spark, pii_docs):
    redacted = redact_pii(pii_docs.fillna({"text": ""}))
    rescanned = scan_pii(redacted)
    assert rescanned.agg(F.sum("pii_total")).collect()[0][0] == 0


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),            # 1 unique of 4
            (2, "w x y z"),            # all unique
            (3, "hi hi there there"),  # 2 unique of 4
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_unique"] == 1
    assert got[1]["dup_word_frac"] == 0.75 and got[1]["top_word_frac"] == 1.0
    assert got[2]["dup_word_frac"] == 0.0 and got[2]["top_word_frac"] == 0.25
    assert got[3]["n_unique"] == 2 and got[3]["top_word_frac"] == 0.5
