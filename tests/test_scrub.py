"""PII scrubbing (x16) semantics beyond the registry hash gate."""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.operators.scrub import (
    PII_PATTERNS,
    redact_pii,
    x16_pii_redaction,
)


def test_redaction_is_complete(spark):
    """After redact_pii, no PII pattern matches anywhere in the text."""
    rows = [
        (1, "write bob.smith+x@corp.example.co.uk or call +1-555-123-4567"),
        (2, "server 192.168.001.004 then 8.8.8.8 done"),
        (3, "no pii at all here"),
        (4, "a@b.io a@b.io twice, and 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, ["id", "body"])
    out = redact_pii(df, "body")
    for _, pat, _ in PII_PATTERNS:
        residue = out.filter(
            F.size(F.regexp_extract_all(F.col("body"), F.lit(pat), F.lit(0)))
            > 0
        ).count()
        assert residue == 0, f"pattern {pat!r} survives redaction"
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ipv4"] == 0
    assert got[4]["n_email"] == 2 and got[4]["n_ipv4"] == 1
    assert "[EMAIL]" in got[1]["body"] and "[PHONE]" in got[1]["body"]
    assert got[3]["body"] == "no pii at all here"


def test_counts_reflect_original_text(spark):
    """Counts are computed on the pre-redaction text (redaction cannot
    zero them out), and every doc the injector dirtied reports a hit."""
    df = x16_pii_redaction(spark, "/root/testdata/sf0.001")
    bad = df.filter(
        ((F.col("doc_id") % 3 == 0) & (F.col("n_email") == 0))
        | ((F.col("doc_id") % 5 == 0) & (F.col("n_phone") == 0))
        | ((F.col("doc_id") % 4 == 0) & (F.col("n_ipv4") == 0))
    ).count()
    assert bad == 0


def test_scrub_plan_has_no_shuffle(spark):
    """The scrub is a pure map: no Exchange in the physical plan."""
    df = x16_pii_redaction(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
