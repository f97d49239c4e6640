"""PII detection/redaction (functions/text.pii_counts, pii_redact)."""

from __future__ import annotations

from opengauss_tools_datachecker_spark.functions.text import pii_counts, pii_redact


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "reach me at jo.doe+x@corp.example.org or 10.0.0.1"),
        (2, "ssn is 123-45-6789, backup 987-65-4321"),
        (3, "clean text, no pii here"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in df.select("id", *pii_counts("text"),
                                         pii_redact("text").alias("red")).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_ssn"]) == (1, 1, 0)
    assert out[1]["red"] == "reach me at <EMAIL> or <IPV4>"
    assert (out[2]["n_email"], out[2]["n_ssn"]) == (0, 2)
    assert out[2]["red"] == "ssn is <SSN>, backup <SSN>"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_ssn"]) == (0, 0, 0)
    assert out[3]["red"] == "clean text, no pii here"
    assert out[4]["n_email"] is None and out[4]["red"] is None


def test_pii_pattern_precedence(spark):
    # an IP-only "email" has no alphabetic TLD -> not an email; the
    # ipv4 pattern picks up the address. A real email containing
    # digits-and-dots in the local part is consumed whole by the email
    # pattern (list order: email first), never double-redacted.
    df = spark.createDataFrame(
        [(1, "x user@10.1.2.34 y"), (2, "a 1.2.3.4x@mail.example.com b")],
        "id long, text string",
    )
    out = {r["id"]: r["red"] for r in df.select("id", pii_redact("text").alias("red")).collect()}
    assert out[1] == "x user@<IPV4> y"
    assert out[2] == "a <EMAIL> b"
