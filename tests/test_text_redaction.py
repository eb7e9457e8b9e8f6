"""PII redaction (functions/text.redact_pii) — typed markers, both engines."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from arc_spark.functions.text import pii_redaction_sql, redact_pii


def _redact_spark(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["red"] for r in
            df.select(redact_pii("text").alias("red")).collect()]


CASES = [
    ("mail bob.smith+x@mail.example.co now", "mail [EMAIL] now"),
    ("ssn 123-45-6789 mid", "ssn [SSN] mid"),
    ("call 555-123-4567 pls", "call [PHONE] pls"),
    ("host 10.0.42.1 up", "host [IP] up"),
    ("a@b.io 1.2.3.4 999-88-7777", "[EMAIL] [IP] [SSN]"),
    ("no pii here 12345", "no pii here 12345"),
    ("", ""),
    # version strings with >4 dotted groups: the first 4 octets match —
    # documented regex behavior, acceptable over-redaction for a scrubber
    ("v 1.2.3.4.5", "v [IP].5"),
]


def test_redact_pii_markers(spark):
    got = _redact_spark(spark, [c[0] for c in CASES])
    assert got == [c[1] for c in CASES]


def test_oracle_sql_form_matches_spark(spark):
    """The DuckDB form of the redaction must produce byte-identical output
    on every case — this is what keeps q47 hash-green."""
    con = duckdb.connect()
    sql = pii_redaction_sql("?")
    for text, want in CASES:
        # duckdb parameter substitution inside the nested regexp_replace
        got = con.execute(f"SELECT {sql}", [text] ).fetchone()[0]
        assert got == want, text


def test_redaction_is_idempotent(spark):
    texts = [c[0] for c in CASES]
    once = _redact_spark(spark, texts)
    twice = _redact_spark(spark, once)
    assert once == twice
