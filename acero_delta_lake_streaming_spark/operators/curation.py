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


def assign_packs(
    toks: DataFrame, budget: int = _PACK_TOKENS
) -> DataFrame:
    """Library form of sequence packing: given ``(source, doc_id,
    n_tokens)`` rows, add ``pack_id`` = floor(tokens-before-me /
    budget) within each source ordered by doc_id — the standard
    deterministic offset-chunking approximation of greedy packing. One
    window shuffle on ``source``; integer math only."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.withColumn(
        "prior", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("pack_id", F.expr(f"prior DIV {budget}"))


def x7_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, pack) accounting over `assign_packs` of the
    documents table."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.expr(f"size({_WORDS_SPARK})").alias("n_tokens"),
    )
    return (
        assign_packs(toks)
        .groupBy("source", "pack_id")
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


# --------------------------------------------------------------------------
# x10 — benchmark-contamination check (n-gram overlap vs a held-out slice)
# --------------------------------------------------------------------------

# 5-gram derivation over the shared word split; guarded for short docs
# (Spark sequence() DESCENDS when stop < start — CLAUDE.md invariant).
_GRAMS5_SPARK = (
    "CASE WHEN size(w) >= 5 THEN "
    "transform(sequence(0, size(w)-5), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])) "
    "ELSE array() END"
)
_GRAMS5_DUCK = (
    "CASE WHEN len(w) >= 5 THEN "
    "list_transform(range(1, len(w)-3), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] "
    "|| ' ' || w[i+4]) ELSE [] END"
)


def x10_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: flag training documents whose 5-grams overlap the
    held-out benchmark slice (the md5-bucket-15 'test' split from x8 —
    the same stable assignment, so the benchmark never drifts between
    runs). Per-doc distinct grams explode once (map-side array_distinct,
    no global distinct); the benchmark gram set — small by construction,
    eval sets are MBs against a 100 TB corpus — broadcasts into the
    probe join, so the only shuffle is the per-doc re-aggregation."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "bucket", F.expr(_BUCKET_SPARK)
    ).withColumn("w", F.expr(_WORDS_SPARK))
    grams = docs.select(
        "doc_id",
        "source",
        "bucket",
        F.explode(F.array_distinct(F.expr(_GRAMS5_SPARK))).alias("gram"),
    )
    bench = (
        grams.filter(F.col("bucket") == 15).select("gram").distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        grams.filter(F.col("bucket") < 15)
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
        .withColumn(
            # Basis points, integer floor-division: a per-doc ratio like
            # k/32 lands exactly on a 4-dp rounding tie, which Spark
            # (HALF_UP) and DuckDB (half-to-even on doubles) break
            # differently — integer math sidesteps the class entirely.
            "contamination_bp",
            F.expr("(10000 * n_hit) DIV nullif(n_grams, 0)"),
        )
        .filter(F.col("n_hit") > 0)
    )


def x10b_decontaminate_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with span TRIMMING — the production follow-on to
    x10's flagging: instead of dropping every document that overlaps
    the held-out benchmark, cut ONLY the contaminated spans (the union
    of word positions covered by benchmark-matching 5-grams) and keep
    the fresh remainder — the difference between losing a whole
    Wikipedia-quoting document and losing one quoted sentence. Per
    trimmed doc: words before, words kept, and the md5 checksum of the
    retained text (value-level proof both engines cut identical spans).

    Scale shape: the benchmark gram set broadcasts (eval sets are MBs
    against a 100 TB corpus), coverage is one ≤5-position explode per
    matching gram folded to a per-doc sorted position array, and the
    retained text is a map-side ``filter(w, (x, i) -> ...)`` over each
    doc's own word array — corpus words never explode or shuffle;
    linear in corpus tokens, the x34b machinery pointed at a reference
    set instead of the corpus itself."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("bucket", F.expr(_BUCKET_SPARK))
        .withColumn("w", F.expr(_WORDS_SPARK))
    )
    train = docs.filter(F.col("bucket") < 15)
    bench = (
        docs.filter(F.col("bucket") == 15)
        .select(
            F.explode(F.array_distinct(F.expr(_GRAMS5_SPARK))).alias(
                "gram"
            )
        )
        .distinct()
    )
    grampos = train.select(
        "doc_id", F.posexplode(F.expr(_GRAMS5_SPARK)).alias("p", "gram")
    )
    covered = (
        grampos.join(F.broadcast(bench), "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(4))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("cov"))
    )
    return (
        train.join(covered, "doc_id")
        .withColumn(
            "kept_w",
            F.expr("filter(w, (x, i) -> NOT array_contains(cov, i))"),
        )
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_words"),
            F.size("kept_w").cast("bigint").alias("n_kept"),
            F.md5(F.array_join("kept_w", " ")).alias("retained_md5"),
        )
    )


_X10B_SQL = (
    f"WITH base AS (SELECT doc_id, {_BUCKET_DUCK} AS bucket, "
    f"{_WORDS_DUCK} AS w FROM documents), "
    "bench AS (SELECT DISTINCT unnest(list_distinct({g5})) AS gram "
    "FROM base WHERE bucket = 15), "
    "grampos AS (SELECT doc_id, u['p'] AS p, u['gram'] AS gram FROM ("
    "SELECT doc_id, unnest(list_transform({g5}, "
    "(x, i) -> {{'p': i - 1, 'gram': x}})) AS u FROM base "
    "WHERE bucket < 15)), "
    "covered AS (SELECT DISTINCT doc_id, pos FROM ("
    "SELECT g.doc_id, unnest(range(g.p, g.p + 5)) AS pos "
    "FROM grampos g JOIN bench b ON b.gram = g.gram)), "
    "wordpos AS (SELECT doc_id, u['pos'] AS pos, u['word'] AS word FROM ("
    "SELECT doc_id, unnest(list_transform(w, "
    "(x, i) -> {{'pos': i - 1, 'word': x}})) AS u FROM base "
    "WHERE bucket < 15)), "
    "totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words "
    "FROM wordpos GROUP BY 1), "
    "kept AS (SELECT wp.doc_id, CAST(count(*) AS BIGINT) AS n_kept, "
    "string_agg(wp.word, ' ' ORDER BY wp.pos) AS rt "
    "FROM wordpos wp LEFT JOIN covered c "
    "ON c.doc_id = wp.doc_id AND c.pos = wp.pos "
    "WHERE c.doc_id IS NULL GROUP BY 1) "
    "SELECT t.doc_id, t.n_words, "
    "CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept, "
    "md5(COALESCE(k.rt, '')) AS retained_md5 "
    "FROM (SELECT DISTINCT doc_id FROM covered) d "
    "JOIN totals t ON t.doc_id = d.doc_id "
    "LEFT JOIN kept k ON k.doc_id = t.doc_id"
).format(g5=_GRAMS5_DUCK)


# --------------------------------------------------------------------------
# x11 — context-window chunking (1→N expansion with overlap)
# --------------------------------------------------------------------------

_CHUNK = 16  # tokens per chunk
_STRIDE = 12  # chunk start step (overlap = _CHUNK - _STRIDE)


def chunk_tokens(
    docs: DataFrame, chunk: int = _CHUNK, stride: int = _STRIDE
) -> DataFrame:
    """Library form of context-window chunking: given rows with a ``w``
    token-array column (plus ``doc_id``/``source``), emit one row per
    chunk (starts at 0, stride, 2·stride, … while start < n_tokens).
    Pure 1→N map-side explode; integer math only, no shuffle at all.
    The CASE guard keeps Spark's descending-sequence edge (n_tokens =
    0) off the plan; DIV (truncate) vs // (floor) never diverge because
    the guarded operand is ≥ 0 (CLAUDE.md int-div invariant)."""
    ids = F.expr(
        f"CASE WHEN size(w) >= 1 THEN sequence(0, (size(w)-1) DIV {stride}) "
        "ELSE array() END"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.size("w").alias("n_tokens"),
            F.explode(ids).alias("chunk_id"),
        )
        .withColumn("chunk_start", F.col("chunk_id") * stride)
        .withColumn(
            "chunk_len",
            F.least(F.lit(chunk), F.col("n_tokens") - F.col("chunk_start")),
        )
    )


def x11_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`chunk_tokens` over the documents table — the context-window
    preparation step before packing/training."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.expr(_WORDS_SPARK)
    )
    return chunk_tokens(docs)


# --------------------------------------------------------------------------
# x12 — repetition-based quality filter (Gopher-style signals)
# --------------------------------------------------------------------------

# 3-gram expression inlined over the already-materialized `w` column
# (dedup._SHINGLES_SPARK assumes the same shape; restated here so the
# short-doc guard reads next to its use).
_GRAMS3_LOCAL_SPARK = (
    "CASE WHEN size(w) >= 3 THEN "
    "transform(sequence(0, size(w)-3), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2])) ELSE array() END"
)
_GRAMS3_LOCAL_DUCK = (
    "CASE WHEN len(w) >= 3 THEN "
    "list_transform(range(1, len(w)-1), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END"
)


def x12_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: duplicate-3-gram fraction
    (1 − distinct/total, array math in the map stage) and top-word
    fraction (one explode → per-(doc, word) count → per-doc max — the
    shuffle stays keyed on doc_id, so it scales with the corpus, never
    with the vocabulary). `keep` applies the Gopher-style cut. Ratios
    are nullif-guarded: a <3-token doc gets NULL dup_3gram_frac in both
    engines rather than Inf-vs-NULL divergence."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.expr(_WORDS_SPARK)
    )
    base = docs.select(
        "doc_id",
        "source",
        "w",
        F.size("w").alias("n_tokens"),
        F.expr(f"size({_GRAMS3_LOCAL_SPARK})").alias("n_grams"),
        F.expr(f"size(array_distinct({_GRAMS3_LOCAL_SPARK}))").alias(
            "n_distinct_grams"
        ),
    )
    word_counts = (
        base.select(
            "doc_id", "source", "n_tokens", "n_grams", "n_distinct_grams",
            F.explode("w").alias("word"),
        )
        .groupBy(
            "doc_id", "source", "n_tokens", "n_grams", "n_distinct_grams",
            "word",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_doc = word_counts.groupBy(
        "doc_id", "source", "n_tokens", "n_grams", "n_distinct_grams"
    ).agg(F.max("n").alias("top_word_n"))
    # Integer basis points (see x10): per-doc ratios land on exact 4-dp
    # rounding ties (k/32 tokens) where the engines' double rounding
    # diverges; floor-division on non-negative ints is bit-identical.
    dup_bp = F.expr(
        "(10000 * (n_grams - n_distinct_grams)) DIV nullif(n_grams, 0)"
    )
    top_bp = F.expr("(10000 * top_word_n) DIV nullif(n_tokens, 0)")
    return per_doc.select(
        "doc_id",
        "source",
        "n_tokens",
        dup_bp.alias("dup_3gram_bp"),
        top_bp.alias("top_word_bp"),
        ((dup_bp < 6000) & (top_bp < 2000)).alias("keep"),
    )


def _hex4_int(md5_expr: str, pos_fn: str) -> str:
    """Integer in [0, 65536) from the first 4 hex chars of an md5."""
    terms = [
        f"({pos_fn}('0123456789abcdef', substr({md5_expr}, {p + 1}, 1)) - 1)"
        f" * {16 ** (3 - p)}"
        for p in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


_X20_MIN_TOKENS = 20
_X20_MAX_CHARS = 520
_X20_LANGS = ("en", "de", "fr", "es")


def x20_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation funnel as ONE Catalyst
    plan: quality filter (token floor, char ceiling) → language filter
    (latin-script set, drops zh) → exact dedup (keep-min-doc_id per
    md5(text); every 7th doc is planted as a copy so the stage provably
    fires) → deterministic split assignment (x8's md5 bucket) → per
    (split, lang) doc and token totals. This is the composition story:
    the stages that exist as individual operators (x4-style stats, x1
    dedup, x8 split) fuse into one declarative plan — one corpus scan,
    one dedup shuffle on the 128-bit text hash, one 12-row aggregate —
    and Catalyst pipelines the filters into the scan. At 100 TB this is
    the plan a curation run actually executes, not a chain of
    materialized intermediate tables."""
    from acero_delta_lake_streaming_spark.operators.dedup import _WORDS_SPARK

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    planted = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    corpus = docs.unionByName(planted)
    filtered = (
        corpus.withColumn("n_tokens", F.expr(f"size({_WORDS_SPARK})"))
        .filter(
            (F.col("n_tokens") >= _X20_MIN_TOKENS)
            & (F.col("n_chars") <= _X20_MAX_CHARS)
            & F.col("lang").isin(*_X20_LANGS)
        )
        .withColumn("h", F.md5(F.col("text")))
    )
    keeper = filtered.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    deduped = filtered.join(keeper, "h").filter(
        F.col("doc_id") == F.col("keep_id")
    )
    bucket = F.expr(_BUCKET_SPARK)
    split = (
        F.when(bucket < 13, "train").when(bucket < 15, "val").otherwise("test")
    )
    return (
        deduped.select(split.alias("split"), "lang", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


def _x20_sql() -> str:
    from acero_delta_lake_streaming_spark.operators.dedup import _WORDS_DUCK

    langs = ", ".join(f"'{la}'" for la in _X20_LANGS)
    return (
        "WITH corpus AS ("
        "SELECT doc_id, text, lang, n_chars FROM documents "
        "UNION ALL "
        "SELECT doc_id + 1000000, text, lang, n_chars FROM documents "
        "WHERE doc_id % 7 = 0), "
        f"t AS (SELECT *, len({_WORDS_DUCK}) AS n_tokens FROM corpus), "
        f"f AS (SELECT *, md5(text) AS h FROM t "
        f"WHERE n_tokens >= {_X20_MIN_TOKENS} "
        f"AND n_chars <= {_X20_MAX_CHARS} AND lang IN ({langs})), "
        "k AS (SELECT h, min(doc_id) AS keep_id FROM f GROUP BY 1), "
        "d AS (SELECT f.* FROM f JOIN k ON f.h = k.h "
        "AND f.doc_id = k.keep_id), "
        "s AS (SELECT CASE WHEN bucket < 13 THEN 'train' "
        "WHEN bucket < 15 THEN 'val' ELSE 'test' END AS split, "
        "lang, n_tokens FROM ("
        f"SELECT *, {_BUCKET_DUCK} AS bucket FROM d)) "
        "SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens "
        "FROM s GROUP BY 1, 2"
    )


def x15_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling — the data-mixing step between
    curation and training: each source gets a target sampling rate
    (here derived from the source index: 25/50/75/100% in rotation,
    standing in for Pile/Dolma-style mixture weights) and documents are
    kept by comparing an md5-derived uniform against it. Per source:
    corpus size, kept size, and the realized rate in integer basis
    points (``10000 * kept DIV total`` — no float rounding to split
    between engines).

    Deterministic and incremental like x8/x9: a document's keep
    decision never changes when the corpus grows, so re-mixing a
    refreshed corpus preserves every previously kept doc — the
    property that keeps training-data diffs reviewable. Pure map +
    one hash-agg on source; no shuffle of payloads."""
    docs = load_table(spark, sf_dir, "documents")
    srcnum = F.regexp_extract("source", "src(\\d+)", 1).cast("int")
    u16 = F.expr(_hex4_int("md5(cast(doc_id as string))", "instr"))
    keep = (u16 * 4) < ((srcnum % 4 + 1) * 65536)
    return (
        docs.select("source", keep.cast("int").alias("k"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("k").cast("bigint").alias("n_kept"),
        )
        .withColumn(
            "realized_bp", F.expr("10000 * n_kept DIV n_docs").cast("bigint")
        )
    )


_X15_SQL = (
    "WITH d AS (SELECT source, "
    "CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) AS srcnum, "
    f"{_hex4_int('md5(cast(doc_id as varchar))', 'strpos')} AS u16 "
    "FROM documents) "
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN u16 * 4 < (srcnum % 4 + 1) * 65536 "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
    "CAST(10000 * sum(CASE WHEN u16 * 4 < (srcnum % 4 + 1) * 65536 "
    "THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS realized_bp "
    "FROM d GROUP BY 1"
)


# --------------------------------------------------------------------------
# x32 — weighted sampling without replacement (A-ES exponential keys)
# --------------------------------------------------------------------------

_WS_K = 200  # sample size


def x32_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES scheme that production data mixers use to
    draw a quality/size-weighted subset in one distributed pass: each
    doc gets key = u^(1/w) (u uniform, w its weight — here ``n_chars``,
    content mass), and the global top-k by key IS an exact weighted
    sample without replacement. Ranking by key is ranking by
    ln(u)/w, so the irrational only enters through one ln evaluated by
    x21b's portable construction (u = (h+1)/2^32 from md5(doc_id) →
    1/u ≥ 1 → integer-exact range reduction + atanh Horner) — both
    engines compute bit-identical doubles, no RNG, re-runs reproduce
    the exact sample. The plan is one scan + TakeOrderedAndProject
    (per-partition partial top-k, driver merges k-row heads): at
    100 TB there is no shuffle at all, the same shape as t1.
    Emitted keys are e12-floored integers (never raw doubles)."""
    docs = load_table(spark, sf_dir, "documents").filter("n_chars > 0")
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _portable_ln,
    )

    keyed = (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn(
            "h",
            F.expr(
                "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), "
                "16, 10) AS BIGINT)"
            ),
        )
        # 1/u ≥ 1: the portable ln's domain; ln(u) = -ln(1/u)
        .withColumn("lx", F.expr("4294967296.0 / (CAST(h AS DOUBLE) + 1.0)"))
        .transform(_portable_ln, "lnx")
        .withColumn("lnu", F.expr("-lnx"))
        .withColumn(
            "key_e12",
            F.expr(
                "CAST(floor(lnu / CAST(n_chars AS DOUBLE) "
                "* 1000000000000.0) AS BIGINT)"
            ),
        )
    )
    return (
        keyed.select("doc_id", "lang", "n_chars", "key_e12")
        .orderBy(F.desc("key_e12"), F.asc("doc_id"))
        .limit(_WS_K)
    )


def _x32_sql() -> str:
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _portable_ln_ctes,
    )

    return (
        "WITH k0s AS (SELECT doc_id, lang, n_chars, "
        "4294967296.0 / (CAST(CAST(('0x' || "
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) "
        "+ 1.0) AS lx "
        "FROM documents WHERE n_chars > 0), "
        + _portable_ln_ctes("k0s", "c", "doc_id, lang, n_chars", "lnx")
        + " SELECT doc_id, lang, n_chars, "
        "CAST(floor(-lnx / CAST(n_chars AS DOUBLE) * 1000000000000.0) "
        "AS BIGINT) AS key_e12 "
        f"FROM c6 ORDER BY key_e12 DESC, doc_id ASC LIMIT {_WS_K}"
    )


def x42_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled LANGUAGE mixing (α = 0.5) — the α-smoothed
    multinomial every multilingual pretraining recipe uses (mBERT/XLM's
    exponent-smoothing): where x15 takes GIVEN mixture rates, this
    DERIVES them from the corpus itself — p_l ∝ n_l^α, so low-resource
    languages are upsampled relative to their raw share and the
    English head damped (the fixture IS en-heavy, so the effect is in
    the certificate: en's realized rate lands well under the flat
    rate, fr's above it). α = ½ keeps the power cross-engine
    exact (IEEE sqrt is correctly rounded in both engines); everything
    downstream is BIGINT: q_s = ⌊√n_s·1000⌋ quantizes the irrational
    BEFORE the cross-source sum (order-independence), the per-source
    keep threshold is pure integer DIV arithmetic against a 16-bit
    md5 uniform, and a rate ≥ 1 (tiny source) caps at keep-all —
    keep-only mixing, duplication is a separate epoch-level concern.

    Plan shape at 100 TB: the source-stats aggregate is O(|sources|)
    (one hash-agg), broadcast back over the corpus scan; the keep
    decision is a pure map — no payload ever shuffles, the same
    incremental-determinism contract as x8/x15 (a doc's fate never
    changes when other sources grow... though its source's THRESHOLD
    does, which is the point of temperature mixing)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "q",
            F.expr(
                "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000) "
                "AS BIGINT)"
            ),
        )
    )
    tot = stats.agg(
        F.sum("q").cast("bigint").alias("qsum"),
        F.sum("n_docs").cast("bigint").alias("total"),
    )
    st = (
        stats.crossJoin(F.broadcast(tot))  # one-row constant frame
        .withColumn(
            "thr",
            F.expr("(q * (total DIV 2) * 65536) DIV (qsum * n_docs)"),
        )
        .withColumn("target_bp", F.expr("10000 * q DIV qsum"))
        .select("lang", "n_docs", "thr", "target_bp")
    )
    u16 = F.expr(_hex4_int("md5(cast(doc_id as string))", "instr"))
    return (
        docs.select("lang", "doc_id")
        .join(F.broadcast(st), "lang")
        .select(
            "lang", "n_docs", "target_bp",
            (u16 < F.col("thr")).cast("int").alias("k"),
        )
        .groupBy("lang")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.sum("k").cast("bigint").alias("n_kept"),
            F.max("target_bp").cast("bigint").alias("target_bp"),
        )
        .withColumn(
            "realized_bp",
            F.expr("10000 * n_kept DIV n_docs").cast("bigint"),
        )
    )


_X42_SQL = (
    "WITH stats AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT) AS q "
    "FROM documents GROUP BY 1), "
    "tot AS (SELECT CAST(sum(q) AS BIGINT) AS qsum, "
    "CAST(sum(n_docs) AS BIGINT) AS total FROM stats), "
    "st AS (SELECT s.lang, s.n_docs, "
    "(s.q * (tot.total // 2) * 65536) // (tot.qsum * s.n_docs) AS thr, "
    "10000 * s.q // tot.qsum AS target_bp FROM stats s CROSS JOIN tot), "
    "d AS (SELECT doc.lang, st.n_docs, st.target_bp, "
    f"CASE WHEN {_hex4_int('md5(cast(doc_id as varchar))', 'strpos')} "
    "< st.thr THEN 1 ELSE 0 END AS k "
    "FROM documents doc JOIN st ON doc.lang = st.lang) "
    "SELECT lang, CAST(max(n_docs) AS BIGINT) AS n_docs, "
    "CAST(sum(k) AS BIGINT) AS n_kept, "
    "CAST(max(target_bp) AS BIGINT) AS target_bp, "
    "CAST(10000 * sum(k) // max(n_docs) AS BIGINT) AS realized_bp "
    "FROM d GROUP BY 1"
)


def x43_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy source selection by MARGINAL 5-gram coverage — the
    submodular facility-location step of data selection (pick the
    source adding the most NEW n-grams to what's already selected,
    repeat): three unrolled greedy rounds, each entirely IN-PLAN via
    x41's top-1-broadcast pattern — per-source marginal counts are one
    vocab-keyed aggregate, the argmax is ``orderBy().limit(1)``
    (deterministic ties: count DESC, source ASC), and the next round
    anti-joins the winner's grams away. No driver decision anywhere:
    the chain is one Catalyst plan per round over a localCheckpointed
    (source, gram) base (CLAUDE.md's iterative-loop rule — round k
    references round k-1 twice).

    At 100 TB: the base is |distinct (source, gram)| — vocab-sized by
    Heaps' law, sublinear in corpus — and every join in the greedy
    chain is keyed by gram or by a ONE-ROW broadcast winner. The
    certificate (winner + exact marginal per round) flips if any
    round's coverage accounting is off by a single gram."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", F.expr(_WORDS_SPARK)
    )
    grams = (
        docs.select(
            "source",
            F.explode(F.array_distinct(F.expr(_GRAMS5_SPARK))).alias(
                "gram"
            ),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    picked_sources = None  # union of 1-row winner frames
    rounds = []
    for r in (1, 2, 3):
        cand = grams
        if picked_sources is not None:
            sel_grams = grams.join(
                F.broadcast(picked_sources), "source", "leftsemi"
            ).select("gram").distinct()
            cand = grams.join(
                F.broadcast(picked_sources), "source", "left_anti"
            ).join(sel_grams, "gram", "left_anti")
        marg = cand.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("new_grams")
        )
        top = marg.orderBy(F.desc("new_grams"), F.asc("source")).limit(1)
        rounds.append(
            top.select(
                F.lit(r).cast("bigint").alias("round"),
                "source",
                "new_grams",
            )
        )
        win = top.select("source")
        picked_sources = (
            win if picked_sources is None
            else picked_sources.unionByName(win)
        )
    out = rounds[0]
    for fr in rounds[1:]:
        out = out.unionByName(fr)
    return out


_X43_SQL = (
    f"WITH d AS (SELECT source, {_WORDS_DUCK} AS w FROM documents), "
    f"g AS (SELECT DISTINCT source, gram FROM (SELECT source, "
    f"unnest(list_distinct({_GRAMS5_DUCK})) AS gram FROM d)), "
    "c1 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g "
    "GROUP BY 1), "
    "p1 AS (SELECT source, n FROM c1 ORDER BY n DESC, source LIMIT 1), "
    "s1 AS (SELECT DISTINCT gram FROM g "
    "WHERE source IN (SELECT source FROM p1)), "
    "c2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g "
    "WHERE source NOT IN (SELECT source FROM p1) "
    "AND gram NOT IN (SELECT gram FROM s1) GROUP BY 1), "
    "p2 AS (SELECT source, n FROM c2 ORDER BY n DESC, source LIMIT 1), "
    "s2 AS (SELECT DISTINCT gram FROM g "
    "WHERE source IN (SELECT source FROM p1 UNION ALL "
    "SELECT source FROM p2)), "
    "c3 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g "
    "WHERE source NOT IN (SELECT source FROM p1 UNION ALL "
    "SELECT source FROM p2) "
    "AND gram NOT IN (SELECT gram FROM s2) GROUP BY 1), "
    "p3 AS (SELECT source, n FROM c3 ORDER BY n DESC, source LIMIT 1) "
    "SELECT CAST(1 AS BIGINT) AS round, source, n AS new_grams FROM p1 "
    "UNION ALL SELECT 2, source, n FROM p2 "
    "UNION ALL SELECT 3, source, n FROM p3"
)


def _bucket16(col: str, fn: str) -> str:
    """First md5 hex digit of ``col`` as 0..15 (``fn``: Spark ``instr``
    / DuckDB ``strpos`` + cast spelling handled by caller)."""
    cast = "string" if fn == "instr" else "varchar"
    return (
        f"{fn}('0123456789abcdef', "
        f"substr(md5(cast({col} as {cast})), 1, 1)) - 1"
    )


def x49_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49 — LEAKAGE-SAFE dataset split: assign train/val/test by
    near-dup COMPONENT, not by document. A per-doc hash split (x8)
    puts two near-identical documents on opposite sides of the
    train/eval line — the silent eval contamination that inflates
    benchmark scores; the fix is standard in production (split by URL
    / cluster / group): every member of a MinHash connected component
    (x2d's graph, the planted near-dup corpus) inherits the split of
    the COMPONENT key's hash, singletons fall back to their own id
    (same 13/2/1 md5-bucket rule as x8). The certificate carries the
    indictment of the naive rule alongside: per split, how many
    multi-doc groups the PER-DOC rule would have torn across splits
    (``leaky_naive`` > 0 on the planted twins — the quantified reason
    this operator exists), while the group rule tears zero by
    construction in both engines.

    Scale shape: the component pass is x2d's (banded MinHash pairs →
    fixed-round min-label propagation, localCheckpoint per round);
    everything after is one |docs| left join against the ~|dup docs|
    component frame plus a two-level rollup. No new corpus-sized
    shuffles beyond the split-key aggregate."""
    from acero_delta_lake_streaming_spark.operators.dedup import (
        _near_dup_corpus,
        connected_components,
        x2_minhash_near_dup,
    )
    from acero_delta_lake_streaming_spark.plans.cache import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    corpus = _near_dup_corpus(docs).select("doc_id")
    pairs = scoped_persist(
        x2_minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    )
    comp = connected_components(pairs)
    g = corpus.join(
        comp, corpus.doc_id == comp.node, "left"
    ).select(
        "doc_id",
        F.expr("coalesce(component, doc_id)").alias("group_key"),
    )
    def _split(bexpr: str) -> F.Column:
        b = F.expr(bexpr)
        return (
            F.when(b < 13, "train").when(b < 15, "val").otherwise("test")
        )

    s = g.select(
        "group_key",
        _split(_bucket16("group_key", "instr")).alias("split"),
        _split(_bucket16("doc_id", "instr")).alias("nsplit"),
    )
    pg = s.groupBy("group_key", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.countDistinct("nsplit").alias("nds"),
    )
    return pg.groupBy("split").agg(
        F.sum("n_members").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("nds") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("leaky_naive"),
    )


def _x49_sql() -> str:
    from acero_delta_lake_streaming_spark.operators.dedup import (
        _NEAR_DUP_CORPUS_SQL,
        _x2_sql,
    )

    def _split(bexpr: str) -> str:
        return (
            f"CASE WHEN {bexpr} < 13 THEN 'train' "
            f"WHEN {bexpr} < 15 THEN 'val' ELSE 'test' END"
        )

    return (
        "WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ("
        + _x2_sql()
        + ")), "
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs), "
        "reach(node, label) AS ("
        "  SELECT u, u FROM edges "
        "  UNION "
        "  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node), "
        "comp AS (SELECT node, min(label) AS component FROM reach "
        "GROUP BY 1), "
        f"d AS (SELECT doc_id FROM ({_NEAR_DUP_CORPUS_SQL})), "
        "g AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) "
        "AS group_key FROM d LEFT JOIN comp c ON c.node = d.doc_id), "
        "s AS (SELECT group_key, "
        f"{_split(_bucket16('group_key', 'strpos'))} AS split, "
        f"{_split(_bucket16('doc_id', 'strpos'))} AS nsplit FROM g), "
        "pg AS (SELECT group_key, split, count(*) AS n_members, "
        "count(DISTINCT nsplit) AS nds FROM s GROUP BY 1, 2) "
        "SELECT split, CAST(sum(n_members) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_groups, "
        "CAST(sum(CASE WHEN nds > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS leaky_naive FROM pg GROUP BY 1"
    )


def x54_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54 — token-budget WATERFILLING across (source, lang) strata
    with per-stratum repetition caps: the data-mixing allocation step
    x42's temperature mixing cannot express (x42 derives RATES; this
    allocates an exact BUDGET under caps — "spend B tokens, weight
    strata by √tokens, never repeat a stratum beyond 2 epochs", the
    Llama/DoReMi-era recipe shape). Strata saturate in cap/weight
    order; the unique cutoff and the final allocation are computed in
    EXACT INTEGER arithmetic (the one irrational, √tok, quantizes to
    milli-units immediately — x42's discipline), so the certificate is
    bit-replayable: per stratum (tokens, cap, alloc, epochs_bp,
    capped).

    Waterfill closed form, all BIGINT: sort by ⌊cap·1e6/w⌋ (stratum,
    lang tiebreaks); a prefix row is capped while
    ``(B − capsum_before)·w ≥ cap·wsum_from`` — a running MIN of that
    flag pins the prefix even under floored-ratio ties — and every
    uncapped stratum gets ``(B − Σ_capped cap)·w DIV Σ_uncapped w``.

    Scale shape: ONE corpus aggregate (hash-agg to |strata| rows);
    every window below it orders the |strata|-row frame (36 rows here,
    thousands at production — always metadata-sized, persisted via
    scoped_persist so the corpus scans once). The corpus itself never
    shuffles and no per-doc state exists — allocation is a plan over
    statistics, applied downstream by x15/x42-style map-side keeps."""
    from acero_delta_lake_streaming_spark.plans.cache import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    strata = scoped_persist(
        docs.select(
            "source", "lang",
            F.expr("size(split(text, ' '))").alias("n_tok"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("n_tok").cast("bigint").alias("tok"))
        .withColumn(
            "w",
            F.expr(
                "CAST(floor(sqrt(CAST(tok AS DOUBLE)) * 1000) AS BIGINT)"
            ),
        )
        .withColumn("cap", F.expr("2 * tok"))
        .withColumn("rk", F.expr("cap * 1000000 DIV w"))
    )
    budget = strata.agg(
        F.expr("CAST(sum(tok) DIV 2 AS BIGINT)").alias("budget")
    )
    ordw = Window.orderBy("rk", "source", "lang")
    flagged = (
        strata.crossJoin(F.broadcast(budget))  # one-row constant frame
        .withColumn(
            "capsum_before",
            F.coalesce(
                F.sum("cap").over(
                    ordw.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn(
            "wsum_from",
            F.sum("w").over(
                ordw.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
        )
        .withColumn(
            "flag",
            F.expr(
                "CASE WHEN (budget - capsum_before) * w >= cap * wsum_from "
                "THEN 1 ELSE 0 END"
            ),
        )
        .withColumn(
            "capped",
            F.min("flag").over(
                ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    rem = flagged.agg(
        F.expr(
            "CAST(max(budget) - sum(CASE WHEN capped = 1 THEN cap "
            "ELSE 0 END) AS BIGINT)"
        ).alias("b_rem"),
        F.expr(
            "CAST(sum(CASE WHEN capped = 0 THEN w ELSE 0 END) AS BIGINT)"
        ).alias("wsum_rem"),
    )
    return (
        flagged.crossJoin(F.broadcast(rem))  # one-row constant frame
        .withColumn(
            "alloc",
            F.expr(
                "CASE WHEN capped = 1 THEN cap "
                "WHEN wsum_rem > 0 THEN (b_rem * w) DIV wsum_rem "
                "ELSE 0 END"
            ),
        )
        .select(
            "source", "lang",
            F.col("tok").cast("bigint").alias("tok"),
            F.col("cap").cast("bigint").alias("cap"),
            F.col("alloc").cast("bigint").alias("alloc"),
            F.expr("10000 * alloc DIV tok").cast("bigint").alias(
                "epochs_bp"
            ),
            F.col("capped").cast("bigint").alias("capped"),
        )
    )


_X54_SQL = (
    "WITH strata AS (SELECT source, lang, "
    "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok "
    "FROM documents GROUP BY 1, 2), "
    "st AS (SELECT source, lang, tok, "
    "CAST(floor(sqrt(CAST(tok AS DOUBLE)) * 1000) AS BIGINT) AS w, "
    "2 * tok AS cap FROM strata), "
    "rk AS (SELECT *, cap * 1000000 // w AS rk FROM st), "
    "b AS (SELECT CAST(sum(tok) // 2 AS BIGINT) AS budget FROM st), "
    "win AS (SELECT r.*, b.budget, "
    "COALESCE(sum(cap) OVER (ORDER BY rk, source, lang "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "AS capsum_before, "
    "sum(w) OVER (ORDER BY rk, source, lang "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS wsum_from "
    "FROM rk r CROSS JOIN b), "
    "flg AS (SELECT *, CASE WHEN (budget - capsum_before) * w >= "
    "cap * wsum_from THEN 1 ELSE 0 END AS flag FROM win), "
    "cp AS (SELECT *, min(flag) OVER (ORDER BY rk, source, lang "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped "
    "FROM flg), "
    "rem AS (SELECT CAST(max(budget) - sum(CASE WHEN capped = 1 "
    "THEN cap ELSE 0 END) AS BIGINT) AS b_rem, "
    "CAST(sum(CASE WHEN capped = 0 THEN w ELSE 0 END) AS BIGINT) "
    "AS wsum_rem FROM cp) "
    "SELECT c.source, c.lang, c.tok, CAST(c.cap AS BIGINT) AS cap, "
    "CAST(CASE WHEN c.capped = 1 THEN c.cap "
    "WHEN r.wsum_rem > 0 THEN (r.b_rem * c.w) // r.wsum_rem "
    "ELSE 0 END AS BIGINT) AS alloc, "
    "CAST(10000 * (CASE WHEN c.capped = 1 THEN c.cap "
    "WHEN r.wsum_rem > 0 THEN (r.b_rem * c.w) // r.wsum_rem "
    "ELSE 0 END) // c.tok AS BIGINT) AS epochs_bp, "
    "CAST(c.capped AS BIGINT) AS capped "
    "FROM cp c CROSS JOIN rem r"
)


def x55_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X55 — corpus NOVELTY curve (Heaps'-law saturation audit): how
    many never-seen-before 5-grams each tranche of the corpus
    contributes, in deterministic ``doc_id`` ingest order — the
    measurement behind "is more of this source still adding
    information, or are we past saturation?" (the data-value twin of
    x51's dedup ROI: x51 prices removal, this prices ACQUISITION).
    Per doc_id-decile tranche: docs, distinct-gram instances, NOVEL
    grams (first seen in that tranche), cumulative vocabulary, and
    novelty in basis points.

    Shape at 100 TB: the distinct (doc, gram) stream is computed ONCE
    and scoped-persisted (gram construction — per-position concat over
    every token — is the dominant compute on repetitive text, and the
    first cut paid it twice: once for per-tranche instance counts,
    once for the novelty aggregate; persisting the stream measured
    16-25 s → 4-11 s at sf0.1). Per-tranche doc counts come from a
    doc_id-ONLY pruned scan (gram-less docs must still count), then
    ONE gram-keyed shuffle to ``min(doc_id)`` — the vocabulary
    aggregate, Heaps-sublinear in the corpus exactly like x46's gram
    stream. Every window below runs over the 10-row tranche frame.
    First-seen attribution via min() is order-free (no sequential
    scan state), so the "curve" parallelizes like any aggregate."""
    from acero_delta_lake_streaming_spark.plans.cache import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(
        F.max("doc_id").cast("bigint").alias("max_id")
    )
    tranche = "(doc_id * 10) DIV (max_id + 1)"
    stream = scoped_persist(
        docs.withColumn("w", F.expr(_WORDS_SPARK)).select(
            "doc_id",
            F.explode(
                F.array_distinct(F.expr(_GRAMS5_SPARK))
            ).alias("gram"),
        )
    )
    doc_rows = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(mx))  # one-row constant frame
        .select(F.expr(tranche).alias("tranche"))
        .groupBy("tranche")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    gram_instances = (
        stream.crossJoin(F.broadcast(mx))
        .select(F.expr(tranche).alias("tranche"))
        .groupBy("tranche")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("gram_instances")
        )
    )
    novel = (
        stream.groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(mx))
        .select(F.expr(tranche.replace("doc_id", "first_doc")).alias(
            "tranche"
        ))
        .groupBy("tranche")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    w_cum = Window.orderBy("tranche").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        doc_rows.join(gram_instances, "tranche", "left")
        .join(novel, "tranche", "left")
        .withColumn(
            "gram_instances",
            F.coalesce("gram_instances", F.lit(0)).cast("bigint"),
        )
        .withColumn("n_novel", F.coalesce("n_novel", F.lit(0)))
        .withColumn(
            "cum_vocab", F.sum("n_novel").over(w_cum).cast("bigint")
        )
        .select(
            F.col("tranche").cast("bigint").alias("tranche"),
            "n_docs",
            "gram_instances",
            F.col("n_novel").cast("bigint").alias("n_novel"),
            "cum_vocab",
            F.expr(
                "10000 * n_novel DIV nullif(gram_instances, 0)"
            ).cast("bigint").alias("novelty_bp"),
        )
    )


_X55_SQL = (
    f"WITH d AS (SELECT doc_id, {_WORDS_DUCK} AS w FROM documents), "
    f"g AS (SELECT doc_id, list_distinct({_GRAMS5_DUCK}) AS grams "
    "FROM d), "
    "mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM g), "
    "ds AS (SELECT (doc_id * 10) // (mx.max_id + 1) AS tranche, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(len(grams)) AS BIGINT) AS gram_instances "
    "FROM g CROSS JOIN mx GROUP BY 1), "
    "fs AS (SELECT gram, min(doc_id) AS first_doc FROM ("
    "SELECT doc_id, unnest(grams) AS gram FROM g) GROUP BY 1), "
    "nv AS (SELECT (first_doc * 10) // (mx.max_id + 1) AS tranche, "
    "CAST(count(*) AS BIGINT) AS n_novel FROM fs CROSS JOIN mx "
    "GROUP BY 1) "
    "SELECT CAST(ds.tranche AS BIGINT) AS tranche, ds.n_docs, "
    "ds.gram_instances, "
    "CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel, "
    "CAST(sum(COALESCE(nv.n_novel, 0)) OVER (ORDER BY ds.tranche "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS cum_vocab, "
    "CAST(10000 * COALESCE(nv.n_novel, 0) "
    "// nullif(ds.gram_instances, 0) AS BIGINT) AS novelty_bp "
    "FROM ds LEFT JOIN nv ON ds.tranche = nv.tranche"
)


# --------------------------------------------------------------------------
# x68 — training-shard writer (the curation family's terminal step)
# --------------------------------------------------------------------------

_N_SHARDS = 8

# Shard assignment: first md5 hex char of the sample key (source:pack)
# mod N — deterministic, stateless, balanced in expectation. The hash
# rule (not a global rank/ntile) is the 100 TB answer: no global sort,
# re-running on a grown corpus never reassigns an existing sample, and
# the ONE corpus shuffle is the repartition on the shard key itself.
_SHARD_SPARK = (
    "(instr('0123456789abcdef', substr(md5(concat(source, ':', "
    "cast(pack_id as string))), 1, 1)) - 1) % "
    f"{_N_SHARDS}"
)
_SHARD_DUCK = (
    "(strpos('0123456789abcdef', substr(md5(source || ':' || "
    "CAST(pack_id AS varchar)), 1, 1)) - 1) % "
    f"{_N_SHARDS}"
)


def shard_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed training samples with their shard assignment: one row per
    (source, pack) carrying doc/token counts, a content fingerprint
    (md5 of the pack's doc ids in order — the oracle-replayable stand-in
    for hashing the token bytes), and the md5-derived ``shard_id``.

    Plan shape (pinned by ``tests/test_plans.py``): ONE exchange on
    ``source`` shared by the packing window and the per-pack aggregate
    (hash-partitioning on ``source`` satisfies the (source, pack_id)
    clustering, so the groupBy adds no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.expr(f"size({_WORDS_SPARK})").alias("n_tokens"),
    )
    return (
        assign_packs(toks)
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.expr(
                "md5(concat_ws(',', transform(array_sort("
                "collect_list(doc_id)), x -> cast(x as string))))"
            ).alias("sample_md5"),
        )
        .withColumn("shard_id", F.expr(_SHARD_SPARK).cast("int"))
    )


def write_training_shards(samples: DataFrame, path: str) -> None:
    """Materialize shard-partitioned training files: one hive directory
    per shard (``shard_id=N/``), rows sorted by (source, pack_id) inside
    each shard so the bytes are reproducible run-over-run. The
    repartition IS the single corpus shuffle; the sort is partition-local
    (no exchange). At 100 TB this writes ~corpus/N per shard with no
    driver-side coordination — the webdataset/tfrecord-shaped terminal
    step of the curation pipeline (the reference's pipeline stops at
    extraction, processor.py:74-117; it has no trainer-facing output)."""
    (
        samples.repartition(_N_SHARDS, "shard_id")
        .sortWithinPartitions("source", "pack_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def x68_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the training shards, then derive the per-shard manifest
    FROM THE FILES READ BACK (shard id, sample count, doc count, token
    count, content md5 = md5 of the sorted per-sample fingerprints) —
    the manifest a training job validates before consuming a shard. The
    read-back makes the writer honest: the oracle replays the assignment
    purely in SQL, so any write-path corruption breaks the hash gate."""
    from acero_delta_lake_streaming_spark.storage.queries import _scratch

    path = _scratch(sf_dir, "x68_shards")
    write_training_shards(shard_samples(spark, sf_dir), path)
    return (
        spark.read.parquet(path)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("n_docs").alias("total_docs"),
            F.sum("pack_tokens").alias("total_tokens"),
            F.expr(
                "md5(concat_ws('', sort_array(collect_list(sample_md5))))"
            ).alias("content_md5"),
        )
    )


_X68_SQL = (
    f"WITH toks AS (SELECT source, doc_id, len({_WORDS_DUCK}) AS n_tokens "
    "FROM documents), "
    "packed AS (SELECT source, doc_id, n_tokens, "
    "COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    f"// {_PACK_TOKENS} AS pack_id FROM toks), "
    "samples AS (SELECT source, pack_id, count(*) AS n_docs, "
    "SUM(n_tokens) AS pack_tokens, "
    "md5(string_agg(CAST(doc_id AS varchar), ',' ORDER BY doc_id)) "
    "AS sample_md5 FROM packed GROUP BY 1, 2), "
    f"sh AS (SELECT *, {_SHARD_DUCK} AS shard_id FROM samples) "
    "SELECT CAST(shard_id AS INT) AS shard_id, count(*) AS n_samples, "
    "CAST(SUM(n_docs) AS BIGINT) AS total_docs, "
    "CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens, "
    "md5(string_agg(sample_md5, '' ORDER BY sample_md5)) AS content_md5 "
    "FROM sh GROUP BY 1"
)


def x68b_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68B — the shard layout's BALANCE AUDIT: x68's md5 assignment is
    balanced only in expectation (law of large numbers), and a training
    job's stragglers are set by the HEAVIEST shard — so the audit
    quantifies the claim instead of asserting it. Per shard: sample and
    token counts, the token share in basis points, and the deviation
    from the ideal 1/N share in basis points (signed). The certificate
    makes the docs' balance statement measurable at every scale the
    gate runs — and at 100 TB this exact query is the pre-flight check
    before handing shards to a trainer. Pure derivation over
    ``shard_samples`` (no write): one source-window exchange + one
    ≤N-row aggregate."""
    samples = shard_samples(spark, sf_dir)
    per = samples.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum("pack_tokens").cast("bigint").alias("shard_tokens"),
    )
    tot = per.agg(
        F.sum("shard_tokens").cast("bigint").alias("total_tokens")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard_id",
            "n_samples",
            "shard_tokens",
            F.expr("10000 * shard_tokens DIV total_tokens")
            .cast("bigint")
            .alias("share_bp"),
            F.expr(
                f"10000 * shard_tokens DIV total_tokens "
                f"- 10000 DIV {_N_SHARDS}"
            )
            .cast("bigint")
            .alias("dev_bp"),
        )
    )


_X68B_SQL = (
    f"WITH toks AS (SELECT source, doc_id, len({_WORDS_DUCK}) AS n_tokens "
    "FROM documents), "
    "packed AS (SELECT source, doc_id, n_tokens, "
    "COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    f"// {_PACK_TOKENS} AS pack_id FROM toks), "
    "samples AS (SELECT source, pack_id, count(*) AS n_docs, "
    "SUM(n_tokens) AS pack_tokens FROM packed GROUP BY 1, 2), "
    f"sh AS (SELECT *, {_SHARD_DUCK} AS shard_id FROM samples), "
    "per AS (SELECT CAST(shard_id AS INT) AS shard_id, "
    "CAST(count(*) AS BIGINT) AS n_samples, "
    "CAST(SUM(pack_tokens) AS BIGINT) AS shard_tokens "
    "FROM sh GROUP BY 1), "
    "tot AS (SELECT CAST(SUM(shard_tokens) AS BIGINT) AS total_tokens "
    "FROM per) "
    "SELECT shard_id, n_samples, shard_tokens, "
    "CAST(10000 * shard_tokens // total_tokens AS BIGINT) AS share_bp, "
    "CAST(10000 * shard_tokens // total_tokens "
    f"- 10000 // {_N_SHARDS} AS BIGINT) AS dev_bp "
    "FROM per CROSS JOIN tot"
)


QUERIES = {
    "x49_leakage_safe_split": x49_leakage_safe_split,
    "x54_budget_waterfill": x54_budget_waterfill,
    "x55_novelty_curve": x55_novelty_curve,
    "x7_sequence_pack": x7_sequence_pack,
    "x8_dataset_split": x8_dataset_split,
    "x9_stratified_sample": x9_stratified_sample,
    "x10_contamination_check": x10_contamination_check,
    "x10b_decontaminate_trim": x10b_decontaminate_trim,
    "x11_context_chunks": x11_context_chunks,
    "x12_repetition_quality": x12_repetition_quality,
    "x15_mixture_sample": x15_mixture_sample,
    "x20_curation_pipeline": x20_curation_pipeline,
    "x32_weighted_sample": x32_weighted_sample,
    "x42_temperature_mix": x42_temperature_mix,
    "x43_coverage_select": x43_coverage_select,
    "x68_training_shards": x68_training_shards,
    "x68b_shard_balance": x68b_shard_balance,
}

ORACLES = {
    "x49_leakage_safe_split": _x49_sql(),
    "x54_budget_waterfill": _X54_SQL,
    "x55_novelty_curve": _X55_SQL,
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
    "x10_contamination_check": (
        f"WITH d AS (SELECT doc_id, source, {_BUCKET_DUCK} AS bucket, "
        f"{_WORDS_DUCK} AS w FROM documents), "
        f"g AS (SELECT doc_id, source, bucket, "
        f"unnest(list_distinct({_GRAMS5_DUCK})) AS gram FROM d), "
        "bench AS (SELECT DISTINCT gram FROM g WHERE bucket = 15), "
        "probe AS (SELECT g.doc_id, g.source, "
        "CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END AS hit "
        "FROM g LEFT JOIN bench b USING (gram) WHERE g.bucket < 15) "
        "SELECT doc_id, source, count(*) AS n_grams, "
        "CAST(SUM(hit) AS BIGINT) AS n_hit, "
        "(10000 * CAST(SUM(hit) AS BIGINT)) // nullif(count(*), 0) "
        "AS contamination_bp "
        "FROM probe GROUP BY 1, 2 HAVING SUM(hit) > 0"
    ),
    "x10b_decontaminate_trim": _X10B_SQL,
    "x11_context_chunks": (
        f"WITH d AS (SELECT doc_id, source, {_WORDS_DUCK} AS w "
        "FROM documents), "
        "c AS (SELECT doc_id, source, len(w) AS n_tokens, "
        f"unnest(CASE WHEN len(w) >= 1 THEN "
        f"range(0, ((len(w)-1) // {_STRIDE}) + 1) ELSE [] END) AS chunk_id "
        "FROM d) "
        "SELECT doc_id, source, n_tokens, chunk_id, "
        f"chunk_id * {_STRIDE} AS chunk_start, "
        f"least({_CHUNK}, n_tokens - chunk_id * {_STRIDE}) AS chunk_len "
        "FROM c"
    ),
    "x12_repetition_quality": (
        f"WITH d AS (SELECT doc_id, source, {_WORDS_DUCK} AS w "
        "FROM documents), "
        "base AS (SELECT doc_id, source, w, len(w) AS n_tokens, "
        f"len({_GRAMS3_LOCAL_DUCK}) AS n_grams, "
        f"len(list_distinct({_GRAMS3_LOCAL_DUCK})) AS n_distinct_grams "
        "FROM d), "
        "wc AS (SELECT doc_id, source, n_tokens, n_grams, n_distinct_grams, "
        "unnest(w) AS word FROM base), "
        "counts AS (SELECT doc_id, source, n_tokens, n_grams, "
        "n_distinct_grams, word, count(*) AS n FROM wc "
        "GROUP BY 1, 2, 3, 4, 5, 6), "
        "pd AS (SELECT doc_id, source, n_tokens, n_grams, n_distinct_grams, "
        "MAX(n) AS top_word_n FROM counts GROUP BY 1, 2, 3, 4, 5), "
        "scored AS (SELECT doc_id, source, n_tokens, "
        "(10000 * (n_grams - n_distinct_grams)) // nullif(n_grams, 0) "
        "AS dup_3gram_bp, "
        "(10000 * top_word_n) // nullif(n_tokens, 0) AS top_word_bp "
        "FROM pd) "
        "SELECT doc_id, source, n_tokens, dup_3gram_bp, top_word_bp, "
        "(dup_3gram_bp < 6000 AND top_word_bp < 2000) AS keep FROM scored"
    ),
    "x15_mixture_sample": _X15_SQL,
    "x32_weighted_sample": _x32_sql(),
    "x20_curation_pipeline": _x20_sql(),
    "x42_temperature_mix": _X42_SQL,
    "x43_coverage_select": _X43_SQL,
    "x68_training_shards": _X68_SQL,
    "x68b_shard_balance": _X68B_SQL,
}
