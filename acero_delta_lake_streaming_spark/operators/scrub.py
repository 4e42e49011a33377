"""PII scrubbing for training corpora: regex detection + redaction of
emails, phone numbers, and IPv4 addresses, with per-document match
accounting.

The reference pipeline ships raw article text straight into LLM
extraction (processor.py:74-117) with no privacy pass; any production
training-data pipeline scrubs PII between ingestion and tokenization.
The synthetic ``documents`` fixture contains no organic PII, so the
query entry deterministically injects synthetic PII derived from
``doc_id`` (no RNG — the same document always carries the same
planted email/phone/IP) and then runs the real redaction machinery
over it; the DuckDB oracle replays both the injection and the scrub,
so detection counts AND the md5 of the redacted text are
hash-verified end to end.

Scale shape: pure per-row map — no shuffle, no Python. The regex
evaluation happens JVM-side inside whole-stage codegen
(``regexp_extract_all`` / ``regexp_replace``), so the scrub runs at
scan speed and pipelines into whatever follows (tokenization,
packing) without a stage break. At 100 TB this is the ideal operator
shape: embarrassingly parallel, zero state.

Parity notes: patterns are restricted to the syntax subset Java
``java.util.regex`` (Spark) and RE2 (DuckDB) evaluate identically —
character classes, bounded repeats, ``\\b`` word boundaries; no
lookaround, no backreferences. Counts are cast to BIGINT on both
sides; the redacted text itself is never emitted raw (md5 + length
only), keeping the row narrow.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from acero_delta_lake_streaming_spark.catalog import load_table

# (kind, pattern, replacement). Pattern syntax is the Java-regex /
# RE2 common subset. Redaction applies in list order; the order is
# load-bearing (an email must be scrubbed before its numeric domain
# fragment could ever be misread by a later pattern).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+1-555-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def redact_pii(df: DataFrame, col: str) -> DataFrame:
    """Add ``n_<kind>`` match counts (computed on the ORIGINAL text)
    and replace ``col`` with its redacted form. Pure map; column order
    of `PII_PATTERNS` decides redaction precedence."""
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))
            .cast("bigint"),
        )
    red = F.col(col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(col, red)


def _inject_spark(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic-PII injection keyed on doc_id: every
    3rd doc gains an email, every 5th a phone, every 4th an IP."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@mail.example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 4 == 0,
        F.concat(
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            ((did * 13) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.withColumn("dirty", F.concat(F.col("text"), email, phone, ip))


def x16_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub the (synthetically dirtied) documents table: per document,
    how many of each PII kind were found, and the md5 + length of the
    redacted text proving the replacement actually happened."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    scrubbed = redact_pii(_inject_spark(docs), "dirty")
    return scrubbed.select(
        "doc_id",
        "source",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.md5(F.col("dirty")).alias("redacted_md5"),
        F.length(F.col("dirty")).cast("bigint").alias("redacted_len"),
    )


_EMAIL_PAT = PII_PATTERNS[0][1]
_PHONE_PAT = PII_PATTERNS[1][1]
_IPV4_PAT = PII_PATTERNS[2][1]

_X16_SQL = (
    "WITH d AS (SELECT doc_id, source, text || "
    "CASE WHEN doc_id % 3 = 0 THEN ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || "
    "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ELSE '' END || "
    "CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
    "CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END AS dirty "
    "FROM documents) "
    "SELECT doc_id, source, "
    f"CAST(len(regexp_extract_all(dirty, '{_EMAIL_PAT}')) AS BIGINT) "
    "AS n_email, "
    f"CAST(len(regexp_extract_all(dirty, '{_PHONE_PAT}')) AS BIGINT) "
    "AS n_phone, "
    f"CAST(len(regexp_extract_all(dirty, '{_IPV4_PAT}')) AS BIGINT) "
    "AS n_ipv4, "
    "md5(regexp_replace(regexp_replace(regexp_replace(dirty, "
    f"'{_EMAIL_PAT}', '[EMAIL]', 'g'), "
    f"'{_PHONE_PAT}', '[PHONE]', 'g'), "
    f"'{_IPV4_PAT}', '[IP]', 'g')) AS redacted_md5, "
    "CAST(length(regexp_replace(regexp_replace(regexp_replace(dirty, "
    f"'{_EMAIL_PAT}', '[EMAIL]', 'g'), "
    f"'{_PHONE_PAT}', '[PHONE]', 'g'), "
    f"'{_IPV4_PAT}', '[IP]', 'g')) AS BIGINT) AS redacted_len "
    "FROM d"
)


QUERIES = {"x16_pii_redaction": x16_pii_redaction}

ORACLES = {"x16_pii_redaction": _X16_SQL}
