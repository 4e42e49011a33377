"""Dataset-curation operators over ``documents`` — the steps between a
raw corpus and a training run: sequence packing, deterministic
train/val/test splitting, and stratified sampling.

The reference has no analog (its pipeline ends at per-article LLM
extraction, processor.py:74-117); these are the operations a 100 TB
training-data pipeline runs after dedup/quality filtering. All three are
pure JVM expressions:

* x7 packs documents into fixed token budgets with one window over
  (source, doc_id) — a single shuffle on ``source``; at 100 TB the
  partition column IS the pack boundary key, so packing parallelizes
  per source shard with no global coordination.
* x8/x9 derive a stable md5 bucket per document — no shuffle beyond the
  final tiny aggregate, no RNG: re-running on a grown corpus never
  reassigns an existing doc's split (the property that keeps eval sets
  uncontaminated across dataset refreshes).

Parity notes: token counts and buckets are integer-only (no float
drift); md5 is the one hash both Spark and DuckDB implement identically
(CLAUDE.md). Spark ``instr``/DuckDB ``strpos`` map the first hex char to
0..15.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.dedup import (
    _WORDS_DUCK,
    _WORDS_SPARK,
)

_PACK_TOKENS = 256  # target context-window budget per pack

# First md5 hex char -> 0..15; 16 buckets split 13/2/1.
_BUCKET_SPARK = (
    "instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1"
)
_BUCKET_DUCK = (
    "strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 1, 1)) - 1"
)


def x7_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget packs: within each source
    (ordered by doc_id), pack_id = floor(tokens-before-me / budget) — the
    standard deterministic offset-chunking approximation of greedy
    sequence packing. One window shuffle on ``source``; integer math
    only."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "source",
        "doc_id",
        F.expr(f"size({_WORDS_SPARK})").alias("n_tokens"),
    )
    packed = toks.withColumn(
        "prior", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("pack_id", F.expr(f"prior DIV {_PACK_TOKENS}"))
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def x8_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 13/2/1 train/val/test split by md5 bucket of doc_id,
    profiled per (split, lang). Hash-based assignment is the scale
    answer: stable under corpus growth, no RNG state, no shuffle until
    the final 15-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    split = (
        F.when(bucket < 13, "train").when(bucket < 15, "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"), "lang", "n_chars"
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def x9_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% stratified sample (md5 bucket < 4) profiled
    against the full stratum — one conditional-aggregation pass, so the
    sample rate per language is auditable without a second scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    in_sample = (bucket < 4).cast("int")
    return (
        docs.select("lang", "n_chars", in_sample.alias("s"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("s").alias("n_sampled"),
            F.sum(F.col("s") * F.col("n_chars")).alias("sampled_chars"),
        )
    )


QUERIES = {
    "x7_sequence_pack": x7_sequence_pack,
    "x8_dataset_split": x8_dataset_split,
    "x9_stratified_sample": x9_stratified_sample,
}

ORACLES = {
    "x7_sequence_pack": (
        f"WITH toks AS (SELECT source, doc_id, len({_WORDS_DUCK}) AS n_tokens "
        "FROM documents), "
        "packed AS (SELECT source, doc_id, n_tokens, "
        "COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        f"// {_PACK_TOKENS} AS pack_id FROM toks) "
        "SELECT source, CAST(pack_id AS BIGINT) AS pack_id, "
        "count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens, "
        "MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc "
        "FROM packed GROUP BY 1, 2"
    ),
    "x8_dataset_split": (
        f"WITH b AS (SELECT {_BUCKET_DUCK} AS bucket, lang, n_chars "
        "FROM documents) "
        "SELECT CASE WHEN bucket < 13 THEN 'train' "
        "WHEN bucket < 15 THEN 'val' ELSE 'test' END AS split, lang, "
        "count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
        "FROM b GROUP BY 1, 2"
    ),
    "x9_stratified_sample": (
        f"WITH b AS (SELECT lang, n_chars, "
        f"CASE WHEN {_BUCKET_DUCK} < 4 THEN 1 ELSE 0 END AS s "
        "FROM documents) "
        "SELECT lang, count(*) AS n_docs, CAST(SUM(s) AS BIGINT) AS n_sampled, "
        "CAST(SUM(s * n_chars) AS BIGINT) AS sampled_chars "
        "FROM b GROUP BY 1"
    ),
}
