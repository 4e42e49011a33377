"""Text-analysis operators (SURVEY.md §2.10 X4) over ``documents``.

The training-data-pipeline text suite: per-document stats + quality
scoring, per-language corpus profiling, mod-sampled content fingerprints
(the winnowing idea), and a self-trained char-bigram language classifier.
All pure JVM expressions — per-row array lambdas and hash-groupBys; the
only shuffles are the aggregations themselves.

Reference anchor: the reference's only text handling is the title+"\\n"+
description concat fed to the LLM (collector.py:182); this module is the
corpus-analysis layer a 100 TB pipeline needs before any LLM sees a row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.plans.cache import scoped_persist
from acero_delta_lake_streaming_spark.operators.dedup import (
    _SHINGLES_DUCK,
    _SHINGLES_SPARK,
    _WORDS_DUCK,
    _WORDS_SPARK,
)

# --------------------------------------------------------------------------
# X4 — per-document stats + quality score (token counting)
# --------------------------------------------------------------------------


def x4_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token stats and a deterministic quality score — one narrow
    projection, no shuffle at all (pure map stage; at 100 TB this is a
    single pass that parquet column pruning reduces to the text column)."""
    docs = load_table(spark, sf_dir, "documents")
    # nullif'd denominator: a zero-token doc must yield NULL ratios in
    # BOTH engines (DuckDB's `x / 0` is Inf under ieee_floating_point_ops,
    # which would diverge from Spark's NULL and break the hash gate).
    ntok = F.expr("nullif(size(w), 0)")
    return (
        docs.withColumn("w", F.expr(_WORDS_SPARK))
        .select(
            "doc_id",
            "lang",
            F.length("text").alias("n_chars_txt"),
            F.size("w").alias("n_tokens"),
            F.size(F.array_distinct("w")).alias("n_distinct"),
            F.round(
                F.length(F.regexp_replace("text", " ", ""))
                / ntok,
                4,
            ).alias("avg_tok_len"),
            F.round(F.size(F.array_distinct("w")) / ntok, 4).alias("ttr"),
            F.round(
                F.size(
                    F.expr("filter(w, x -> x IN ('a', 'the'))")
                )
                / ntok,
                4,
            ).alias("stopword_ratio"),
            F.round(
                F.least(F.size("w") / F.lit(100.0), F.lit(1.0))
                * (F.size(F.array_distinct("w")) / ntok),
                4,
            ).alias("quality"),
        )
    )


_X4_SQL = (
    f"WITH d AS (SELECT doc_id, lang, text, {_WORDS_DUCK} AS w FROM documents) "
    "SELECT doc_id, lang, length(text) AS n_chars_txt, "
    "len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct, "
    "round(length(replace(text, ' ', '')) * 1.0 / nullif(len(w), 0), 4) "
    "AS avg_tok_len, "
    "round(len(list_distinct(w)) * 1.0 / nullif(len(w), 0), 4) AS ttr, "
    "round(len(list_filter(w, x -> x IN ('a', 'the'))) * 1.0 "
    "/ nullif(len(w), 0), 4) AS stopword_ratio, "
    "round(least(len(w) / 100.0, 1.0) * "
    "(len(list_distinct(w)) * 1.0 / nullif(len(w), 0)), 4) AS quality "
    "FROM d"
)


# --------------------------------------------------------------------------
# X4b — per-language corpus profile
# --------------------------------------------------------------------------


def x4b_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus aggregates: one partial+final hash agg, shuffle
    volume = |langs|."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("w", F.expr(_WORDS_SPARK))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
            F.sum(F.size("w")).alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


_X4B_SQL = (
    f"WITH d AS (SELECT lang, source, text, {_WORDS_DUCK} AS w FROM documents) "
    "SELECT lang, count(*) AS n_docs, round(avg(length(text)), 2) AS avg_chars, "
    "CAST(sum(len(w)) AS BIGINT) AS total_tokens, "
    "count(DISTINCT source) AS n_sources "
    "FROM d GROUP BY 1"
)


# --------------------------------------------------------------------------
# X4c — mod-sampled content fingerprints (winnowing-style)
# --------------------------------------------------------------------------


def x4c_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: hash every word-trigram shingle, keep hashes
    whose first hex digit is 0 (deterministic 1/16 mod-sampling — the
    selection is content-defined, so near-identical docs keep
    near-identical fingerprint sets, the property winnowing relies on)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = (
        docs.withColumn("w", F.expr(_WORDS_SPARK))
        .select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh"))
        .select("doc_id", F.md5("sh").alias("h"))
        .filter(F.substring("h", 1, 1) == "0")
        .distinct()
    )
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.min("h").alias("min_fp"),
        F.max("h").alias("max_fp"),
    )


_X4C_SQL = (
    "WITH corpus AS (SELECT doc_id, text FROM documents), "
    "sh AS (SELECT DISTINCT doc_id, md5(s) AS h FROM ("
    f"  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM ("
    f"    SELECT doc_id, {_WORDS_DUCK} AS w FROM corpus)) "
    "  WHERE substr(md5(s), 1, 1) = '0') "
    "SELECT doc_id, count(*) AS n_fp, min(h) AS min_fp, max(h) AS max_fp "
    "FROM sh GROUP BY 1"
)


# --------------------------------------------------------------------------
# X4d — self-trained char-bigram language classifier
# --------------------------------------------------------------------------

_PROFILE_K = 20


def x4d_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language-ID: train per-lang top-20 char-bigram profiles from
    the corpus, classify each doc by profile overlap, emit the confusion
    matrix (lang × predicted). Plan: bigram explode → two hash aggs for
    the profile (+top-k window) → semi-ish equi-join on bigram → argmax
    window. Everything shuffles on bigrams or (doc, lang) — bounded keys."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # Guarded like _SHINGLES_SPARK: on a 0/1-char text Spark's
    # sequence(1, length-1) would DESCEND (implicit step -1) and emit
    # spurious bigrams where DuckDB's range(1, length) is empty.
    bigram_expr = (
        "CASE WHEN length(text) >= 2 THEN "
        "transform(sequence(1, length(text) - 1), i -> substr(text, i, 2)) "
        "ELSE array() END"
    )
    grams = docs.select(
        "doc_id", "lang", F.explode(F.expr(bigram_expr)).alias("bg")
    )
    prof_w = Window.partitionBy("p_lang").orderBy(
        F.desc("cnt"), F.asc("bg")
    )
    profile = (
        grams.groupBy(F.col("lang").alias("p_lang"), "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(prof_w))
        .filter(F.col("rk") <= _PROFILE_K)
        .select("p_lang", "bg")
    )
    doc_grams = grams.select("doc_id", "lang", "bg").distinct()
    score_w = Window.partitionBy("doc_id").orderBy(
        F.desc("matched"), F.asc("p_lang")
    )
    scored = (
        doc_grams.join(profile, "bg")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(F.count(F.lit(1)).alias("matched"))
        .withColumn("rk", F.row_number().over(score_w))
        .filter(F.col("rk") == 1)
    )
    return (
        scored.groupBy("lang", F.col("p_lang").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_X4D_SQL = (
    "WITH grams AS (SELECT doc_id, lang, unnest(list_transform("
    "  range(1, length(text)), i -> substr(text, i, 2))) AS bg "
    "  FROM documents), "
    "prof_counts AS (SELECT lang AS p_lang, bg, count(*) AS cnt "
    "  FROM grams GROUP BY 1, 2), "
    "profile AS (SELECT p_lang, bg FROM ("
    "  SELECT p_lang, bg, row_number() OVER (PARTITION BY p_lang "
    "  ORDER BY cnt DESC, bg ASC) AS rk FROM prof_counts) "
    f"  WHERE rk <= {_PROFILE_K}), "
    "doc_grams AS (SELECT DISTINCT doc_id, lang, bg FROM grams), "
    "scored AS (SELECT doc_id, lang, p_lang, count(*) AS matched "
    "  FROM doc_grams JOIN profile USING (bg) GROUP BY 1, 2, 3), "
    "best AS (SELECT doc_id, lang, p_lang FROM ("
    "  SELECT doc_id, lang, p_lang, row_number() OVER (PARTITION BY doc_id "
    "  ORDER BY matched DESC, p_lang ASC) AS rk FROM scored) WHERE rk = 1) "
    "SELECT lang, p_lang AS predicted, count(*) AS n_docs "
    "FROM best GROUP BY 1, 2"
)


# --------------------------------------------------------------------------
# X4e — BPE-style pre-tokenizer counting
# --------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer split (contractions | space?-letters |
#: space?-digits | space?-punct-run) with the RE2-unsupported trailing
#: whitespace lookahead dropped — verified to tokenize identically under
#: Java regex (Spark) and RE2 (DuckDB).
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def x4e_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting the way an LLM pipeline budgets cost: whitespace
    tokens next to BPE-style pre-tokens per document. Pure map stage —
    at 100 TB this is one pruned-column pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    return docs.select(
        "doc_id",
        F.size(F.expr(_WORDS_SPARK)).alias("n_ws_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
    )


_X4E_SQL = (
    "SELECT doc_id, "
    f"len({_WORDS_DUCK}) AS n_ws_tokens, "
    f"len(regexp_extract_all(text, '{_BPE_PAT.replace(chr(39), chr(39) * 2)}')) "
    "AS n_bpe_tokens, "
    "len(list_distinct(regexp_extract_all(text, "
    f"'{_BPE_PAT.replace(chr(39), chr(39) * 2)}'))) AS n_bpe_distinct "
    "FROM documents"
)


# --------------------------------------------------------------------------
# X41 — distributed BPE merge TRAINING (tokenizer fitting)
# --------------------------------------------------------------------------

#: Adjacent symbol pairs of a split symbol array. element_at is 1-BASED
#: in BOTH engines (never use Spark's 0-based `[]` / DuckDB's 1-based
#: `[]` directly — the aligned indexing gotcha). Spark's sequence(1, n)
#: DESCENDS when n < 1 while DuckDB's range is empty, so sub-2-symbol
#: words guard with CASE on both sides.
_BPE_PAIRS_SPARK = (
    "CASE WHEN size(syms) < 2 THEN CAST(array() AS ARRAY<STRING>) "
    "ELSE transform(sequence(1, size(syms) - 1), "
    "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) END"
)
_BPE_PAIRS_DUCK = (
    "CASE WHEN len(syms) < 2 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len(syms)), "
    "i -> list_extract(syms, i) || ' ' || list_extract(syms, i + 1)) END"
)


def _bpe_merge(col: str, pat: str) -> str:
    """The bounded two-pass merge: non-overlapping left-to-right
    ``replace`` of ``' a b '`` with ``' ab '`` run TWICE. One pass
    misses every occurrence that shares its leading space with the
    previous match ("a b a b" merges 1st and skips 2nd); after pass
    one each survivor is flanked by already-merged symbols, so its
    spaces are its own and pass two catches it — two passes merge
    every mergeable occurrence for any run length. Within an odd
    repetition run the kept boundary can differ from reference BPE's
    strictly-greedy choice by one position; the convention is
    deterministic and, because ``replace``/``concat`` have identical
    semantics in Spark and DuckDB, engine-identical — which is the
    contract the hash gate certifies. Same expression text runs on
    both engines."""
    one = (
        f"replace({col}, concat(' ', {pat}, ' '), "
        f"concat(' ', replace({pat}, ' ', ''), ' '))"
    )
    return (
        f"replace({one}, concat(' ', {pat}, ' '), "
        f"concat(' ', replace({pat}, ' ', ''), ' '))"
    )


def _bpe_train(words: DataFrame) -> tuple[list[DataFrame], DataFrame]:
    """The three-round merge-learning loop shared by x41 (which reports
    the table) and x41b (which ENCODES with it): per round — pair
    counts over the vocab, deterministic top pair (count DESC, pair
    ASC), broadcast back, map-side two-pass merge. Returns the three
    1-row learned frames (step, pair, cnt) and the post-merge vocab."""
    cur = words.select(
        F.expr("concat(' ', regexp_replace(word, '(.)', '$1 '))").alias(
            "sym"
        ),
        "wt",
    )
    learned = []
    for k in (1, 2, 3):
        pairs = (
            cur.select(
                F.expr("filter(split(sym, ' '), x -> x != '')").alias(
                    "syms"
                ),
                "wt",
            )
            .select(F.explode(F.expr(_BPE_PAIRS_SPARK)).alias("pair"), "wt")
            .groupBy("pair")
            .agg(F.sum("wt").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1)
        learned.append(
            top.select(F.lit(k).alias("step"), "pair", "cnt")
        )
        cur = cur.crossJoin(
            F.broadcast(top.select(F.col("pair").alias("_p")))
        ).select(F.expr(_bpe_merge("sym", "_p")).alias("sym"), "wt")
    return learned, cur


def x41_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X41 — byte-pair-encoding merge TRAINING, distributed: the
    tokenizer-fitting step of an LLM data pipeline (Sennrich et al.
    2016), three unrolled merge rounds. x4e counts with a FIXED
    pre-tokenizer; this learns the merge table itself.

    Plan shape: ONE corpus shuffle (word → count) reduces everything
    to the vocabulary, which Heaps' law keeps sublinear in corpus
    size; each round is then a vocab-sized map (symbol split + pair
    build), a pair-keyed aggregate (bounded by vocab × avg word
    length), a 1-row top-pair TakeOrderedAndProject broadcast back,
    and a map-side 2-pass merge. Nothing corpus-sized moves after the
    first aggregate — the exact structure of distributed BPE trainers
    (e.g. Hugging Face tokenizers' chunked pair counting), and at
    100 TB the three rounds cost three vocab shuffles, not three
    corpus passes. Ties break (count DESC, pair ASC) so the learned
    table is reproducible.

    Certificate: the three learned merges with their pair counts plus
    the post-merge corpus accounting (weighted symbol total and
    distinct symbol count) — a wrong merge anywhere in the corpus
    flips the accounting rows."""
    docs = load_table(spark, sf_dir, "documents")
    # The one corpus pass, materialized EAGERLY (x2d's localCheckpoint
    # pattern): every later round consumes it through three concurrent
    # broadcast subplans, which would otherwise race a lazy cache and
    # each recompute the corpus aggregate (measured 16 s → 7 s at
    # sf0.1). The checkpointed frame is vocab-sized.
    words = (
        docs.select(F.explode(F.expr(_WORDS_SPARK)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
        .localCheckpoint(eager=True)
    )
    learned, cur = _bpe_train(words)
    fin = cur.select(
        F.expr("filter(split(sym, ' '), x -> x != '')").alias("syms"), "wt"
    )
    vocab = (
        fin.select(F.explode("syms").alias("s"))
        .agg(F.countDistinct("s").cast("long").alias("cnt"))
        .select(
            F.lit(0).alias("step"), F.lit("__vocab__").alias("pair"), "cnt"
        )
    )
    total = fin.agg(
        F.sum(F.size("syms") * F.col("wt")).cast("long").alias("cnt")
    ).select(
        F.lit(0).alias("step"), F.lit("__tokens__").alias("pair"), "cnt"
    )
    out = learned[0]
    for part in learned[1:] + [vocab, total]:
        out = out.unionByName(part)
    return out


def _x41_round_ctes(prev: str, k: int) -> str:
    """One BPE round as DuckDB CTEs: pair counts from ``prev``, the
    deterministic top pair, and the merged symbol strings. The merge
    expression is the SAME text the Spark side compiles."""
    return (
        f"p{k} AS (SELECT pair, CAST(sum(wt) AS BIGINT) AS cnt FROM ("
        f"SELECT unnest({_BPE_PAIRS_DUCK}) AS pair, wt FROM ("
        f"SELECT list_filter(string_split(sym, ' '), x -> x <> '') "
        f"AS syms, wt FROM {prev})) GROUP BY 1), "
        f"t{k} AS (SELECT pair, cnt FROM p{k} "
        f"ORDER BY cnt DESC, pair LIMIT 1), "
        f"m{k} AS (SELECT {_bpe_merge('sym', f't{k}.pair')} AS sym, wt "
        f"FROM {prev}, t{k})"
    )


_X41_SQL = (
    "WITH words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS wt "
    f"FROM (SELECT unnest({_WORDS_DUCK}) AS w FROM documents) "
    "GROUP BY 1), "
    "s0 AS (SELECT concat(' ', regexp_replace(word, '(.)', '\\1 ', 'g')) "
    "AS sym, wt FROM words), "
    + _x41_round_ctes("s0", 1) + ", "
    + _x41_round_ctes("m1", 2) + ", "
    + _x41_round_ctes("m2", 3) + ", "
    "fin AS (SELECT list_filter(string_split(sym, ' '), x -> x <> '') "
    "AS syms, wt FROM m3) "
    "SELECT 1 AS step, pair, cnt FROM t1 "
    "UNION ALL SELECT 2, pair, cnt FROM t2 "
    "UNION ALL SELECT 3, pair, cnt FROM t3 "
    "UNION ALL SELECT 0, '__vocab__', CAST(count(DISTINCT s) AS BIGINT) "
    "FROM (SELECT unnest(syms) AS s FROM fin) "
    "UNION ALL SELECT 0, '__tokens__', "
    "CAST(sum(len(syms) * wt) AS BIGINT) FROM fin"
)


# --------------------------------------------------------------------------
# X41b — BPE ENCODING with the learned merge table (tokenizer apply)
# --------------------------------------------------------------------------


def _bpe_encode_expr(sym0: str, m1: str, m2: str, m3: str) -> str:
    """The encode chain: char-split a word, apply the three learned
    merges in training order (each the bounded two-pass replace), count
    surviving symbols. SAME expression text in both engines."""
    merged = _bpe_merge(_bpe_merge(_bpe_merge(sym0, m1), m2), m3)
    return f"size(filter(split({merged}, ' '), x -> x != ''))"


def _bpe_doc_counts(
    spark: SparkSession, sf_dir: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document (n_words, n_syms, n_tokens) under the x41-learned
    3-merge BPE — the single source both the per-doc encode view
    (x41b) and the per-language fertility rollup (x66) derive from, so
    the two can never drift on the merge table or the encode chain.
    ``keep`` passes extra document columns (e.g. ``lang``) through the
    pure-map encode stage."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", *keep
    )
    words = (
        docs.select(F.explode(F.expr(_WORDS_SPARK)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
        .localCheckpoint(eager=True)
    )
    learned, _cur = _bpe_train(words)
    merges = (
        learned[0]
        .select(F.col("pair").alias("m1"))
        .crossJoin(F.broadcast(learned[1].select(F.col("pair").alias("m2"))))
        .crossJoin(F.broadcast(learned[2].select(F.col("pair").alias("m3"))))
    )
    # Whole-document encode (r13, guide §1.2 per-task work): the merge
    # chain runs ONCE over the full text's char expansion instead of
    # per-word inside a transform() lambda (higher-order functions are
    # interpreted per element — ~1000 words/doc each paid regexp + 6
    # replaces + an array build). Equivalence: symbols never contain
    # spaces (trained on space-split words) and a word boundary in the
    # expanded string is >= 3 consecutive spaces (the separator space
    # itself expands), so ' a b '-shaped patterns cannot match across
    # words and the left-to-right non-overlapping scan decomposes into
    # exactly the per-word scans. n_syms = non-space chars is the same
    # sum-of-word-lengths identity. Values bit-identical; oracle
    # unchanged (measured x41b 2.21 -> see OPTIMIZATION_r13.md).
    e0 = "concat(' ', regexp_replace(text, '(.)', '$1 '))"
    e3 = _bpe_merge(_bpe_merge(_bpe_merge(e0, "m1"), "m2"), "m3")
    return docs.crossJoin(F.broadcast(merges)).select(
        "doc_id",
        *keep,
        F.expr(f"size({_WORDS_SPARK})").cast("bigint").alias("n_words"),
        # coalesce restores the pre-r13 NULL-text contract (ADVICE r13):
        # the oracle's list_sum(NULL) coalesces to 0, and the old
        # per-word aggregate form did too — the whole-doc rewrite must
        # not re-open that cross-engine divergence surface.
        F.expr("coalesce(length(replace(text, ' ', '')), 0)")
        .cast("bigint")
        .alias("n_syms"),
        F.expr(f"coalesce(size(filter(split({e3}, ' '), x -> x != '')), 0)")
        .cast("bigint")
        .alias("n_tokens"),
    )


def x41b_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X41b — apply the x41-learned BPE merge table to ENCODE every
    document: the tokenizer-apply step that turns a trained merge list
    into per-document token counts (what packing (x7), pricing, and
    context budgeting consume). Per doc: words, pre-merge symbol count
    (= characters), post-merge token count, and the compression in
    basis points. Re-uses ``_bpe_train`` verbatim so trainer and
    encoder cannot drift on the merge table.

    Scale shape: training is x41's vocab-sized shuffles (sublinear by
    Heaps' law); the merge table is a 1-ROW broadcast and encoding is
    a pure map stage over documents — per-word char split + three
    two-pass replaces + a size fold, whole-stage codegen, the corpus
    never shuffles. At 100 TB this is one pass over the text column.
    Certificate: integer-only outputs (counts + basis points), so any
    merge-application divergence anywhere flips a row."""
    return _bpe_doc_counts(spark, sf_dir).select(
        "doc_id",
        "n_words",
        "n_syms",
        "n_tokens",
        F.expr("(10000 * (n_syms - n_tokens)) DIV nullif(n_syms, 0)")
        .cast("bigint")
        .alias("compress_bp"),
    )


def x66_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66 — the per-LANGUAGE tokenizer fertility audit: tokens/word,
    chars/token and compression under the x41-learned BPE, rolled up
    by ``lang``. This is the audit a multilingual pipeline runs before
    trusting a tokenizer's budget math — a tokenizer trained on one
    language's character statistics over-fragments the others
    (fertility ≫ 1 token/word inflates context cost and effectively
    down-weights the language at a fixed token budget; the basis-point
    deltas here ARE that tax, per language). Derives from the SAME
    per-doc encode frame as x41b (``_bpe_doc_counts``), so the audit
    audits the shipped tokenizer, not a re-derivation.

    Scale: one pure-map encode pass over documents (the x41b shape),
    then a |langs|-row aggregate — ratios computed once from the
    summed numerators/denominators (never averaged per-doc), integer
    basis points end-to-end."""
    per_doc = _bpe_doc_counts(spark, sf_dir, keep=("lang",))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("words"),
            F.sum("n_syms").cast("bigint").alias("syms"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "words",
            "syms",
            "tokens",
            F.expr("(10000 * tokens) DIV nullif(words, 0)")
            .cast("bigint")
            .alias("fertility_bp"),
            F.expr("(10000 * syms) DIV nullif(tokens, 0)")
            .cast("bigint")
            .alias("chars_per_token_bp"),
            F.expr("(10000 * (syms - tokens)) DIV nullif(syms, 0)")
            .cast("bigint")
            .alias("compress_bp"),
        )
    )


def _bpe_enc_prefix(keep: str = "") -> str:
    """Shared DuckDB WITH-body: train the 3-merge table, encode every
    document into (n_words, n_syms, n_tokens) — the oracle twin of
    :func:`_bpe_doc_counts`, single-sourced for x41b and x66. ``keep``
    adds pass-through document columns to the ``enc`` CTE (e.g.
    ``"lang, "``)."""
    sym0 = "concat(' ', regexp_replace(word, '(.)', '\\1 ', 'g'))"
    enc = _bpe_encode_expr(sym0, "m1", "m2", "m3")
    # DuckDB's size/filter/split aliases: len / list_filter /
    # string_split — rewrite the engine-specific names in the shared
    # expression text (replace/concat/nullif are already identical).
    enc = (
        enc.replace("size(filter(split(", "len(list_filter(string_split(")
        .replace("x -> x != ''", "x -> x <> ''")
    )
    return (
        "WITH words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS wt "
        f"FROM (SELECT unnest({_WORDS_DUCK}) AS w FROM documents) "
        "GROUP BY 1), "
        "s0 AS (SELECT concat(' ', regexp_replace(word, '(.)', '\\1 ', "
        "'g')) AS sym, wt FROM words), "
        + _x41_round_ctes("s0", 1) + ", "
        + _x41_round_ctes("m1", 2) + ", "
        + _x41_round_ctes("m2", 3) + ", "
        "mt AS (SELECT t1.pair AS m1, t2.pair AS m2, t3.pair AS m3 "
        "FROM t1 CROSS JOIN t2 CROSS JOIN t3), "
        f"enc AS (SELECT doc_id, {keep}"
        f"len({_WORDS_DUCK}) AS n_words, "
        f"coalesce(list_sum(list_transform({_WORDS_DUCK}, "
        "word -> length(word))), 0) AS n_syms, "
        f"coalesce(list_sum(list_transform({_WORDS_DUCK}, "
        f"word -> {enc})), 0) AS n_tokens "
        "FROM documents CROSS JOIN mt) "
    )


def _x41b_sql() -> str:
    return (
        _bpe_enc_prefix()
        + "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(n_syms AS BIGINT) AS n_syms, "
        "CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST((10000 * (n_syms - n_tokens)) // nullif(n_syms, 0) "
        "AS BIGINT) AS compress_bp FROM enc"
    )


def _x66_sql() -> str:
    return (
        _bpe_enc_prefix(keep="lang, ")
        + "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_words) AS BIGINT) AS words, "
        "CAST(sum(n_syms) AS BIGINT) AS syms, "
        "CAST(sum(n_tokens) AS BIGINT) AS tokens, "
        "CAST((10000 * sum(n_tokens)) // nullif(sum(n_words), 0) "
        "AS BIGINT) AS fertility_bp, "
        "CAST((10000 * sum(n_syms)) // nullif(sum(n_tokens), 0) "
        "AS BIGINT) AS chars_per_token_bp, "
        "CAST((10000 * (sum(n_syms) - sum(n_tokens))) "
        "// nullif(sum(n_syms), 0) AS BIGINT) AS compress_bp "
        "FROM enc GROUP BY 1"
    )


# --------------------------------------------------------------------------
# X50 — distributed linear quality probe (gradient-descent training)
# --------------------------------------------------------------------------

#: fixed-order prediction fold — SAME expression text in both engines,
#: so the IEEE op sequence (and therefore every bit of every weight)
#: is engine-identical
_X50_PRED = "(((w0 * x0) + (w1 * x1)) + (w2 * x2)) + (w3 * x3)"
_X50_ROUNDS = 8


def x50_quality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X50 — a LINEAR QUALITY PROBE trained in-engine by distributed
    gradient descent: the fastText-style quality-classifier step of a
    curation pipeline (label a slice, fit a cheap linear model, score
    the corpus) expressed as pure DataFrame ops — training is a
    join+agg loop exactly like k-means (x3d), no ML runtime involved.
    Features per doc: bias, word count, distinct-word count, long-word
    count (each /256 — an exact halving chain, so features are exact
    doubles); the label is the deterministic lexical-diversity rule
    2·distinct > words. Eight unrolled squared-loss GD rounds (lr 1,
    94.8% train accuracy at sf0.01 vs the 42% majority class):
    per-row gradient contributions are floor-QUANTIZED to integer
    micro-units BEFORE the cross-row sum — the x35/x45
    order-independence discipline, here applied to learning — so the
    weight updates derive from exact BIGINTs and the final weights are
    bit-identical in both engines. Certificate: the quantized weights
    plus the full confusion matrix of the trained probe.

    Scale shape: each GD round is ONE scan of the features frame
    (scoped-persisted) against a 1-row broadcast weight frame folding
    to a 1-row gradient aggregate — O(rounds) passes, shuffle payload
    4 integers; the same geometry SGD-on-Spark systems use for convex
    models. At 100 TB: sample the labeled slice, train on it, score
    everything map-side."""
    docs = load_table(spark, sf_dir, "documents")
    feats = scoped_persist(
        docs.select(
            F.lit(1.0).alias("x0"),
            F.expr(
                f"CAST(size({_WORDS_SPARK}) AS DOUBLE) / 256.0"
            ).alias("x1"),
            F.expr(
                f"CAST(size(array_distinct({_WORDS_SPARK})) AS DOUBLE) "
                "/ 256.0"
            ).alias("x2"),
            F.expr(
                f"CAST(size(filter({_WORDS_SPARK}, "
                "x -> length(x) > 5)) AS DOUBLE) / 256.0"
            ).alias("x3"),
            F.expr(
                f"CASE WHEN 2 * size(array_distinct({_WORDS_SPARK})) "
                f"> size({_WORDS_SPARK}) THEN 1 ELSE 0 END"
            ).alias("y"),
        )
    )
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(4)]
    )
    for _ in range(_X50_ROUNDS):
        joined = feats.crossJoin(F.broadcast(w))
        sums = joined.agg(
            *[
                F.sum(
                    F.expr(
                        f"CAST(floor((({_X50_PRED}) - CAST(y AS DOUBLE))"
                        f" * x{j} * 1000000.0) AS BIGINT)"
                    )
                ).alias(f"g{j}")
                for j in range(4)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        # each round references the previous round's weights through two
        # subplans (gradient + update) — without a per-round lineage cut
        # the logical plan doubles every round and OOMs by round 8 (the
        # CLAUDE.md iterative-loop invariant; the frame is ONE row)
        w = (
            w.crossJoin(F.broadcast(sums))
            .select(
                *[
                    F.expr(
                        f"w{j} - CAST(g{j} AS DOUBLE) / "
                        "(1000000.0 * CAST(n AS DOUBLE))"
                    ).alias(f"w{j}")
                    for j in range(4)
                ]
            )
            .localCheckpoint(eager=True)
        )
    # decision threshold = the label MEAN (one exact integer ratio,
    # identical division both engines) — centred for a squared-loss
    # probe, where 0.5 would sit above the fitted response range
    ym = feats.agg(
        F.expr(
            "CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
        ).alias("t")
    )
    conf = (
        feats.crossJoin(F.broadcast(w))
        .crossJoin(F.broadcast(ym))
        .select(
            "y",
            F.expr(
                f"CASE WHEN ({_X50_PRED}) > t THEN 1 ELSE 0 END"
            ).alias("p"),
        )
        .groupBy("y", "p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
        .select(
            F.lit("conf").alias("part"),
            F.expr("concat('y', y, '_p', p)").alias("k"),
            "v",
        )
    )
    stack = ", ".join(
        f"'w{j}', CAST(floor(w{j} * 1000000000.0) AS BIGINT)"
        for j in range(4)
    )
    wrows = w.selectExpr(f"stack(4, {stack}) as (k, v)").select(
        F.lit("w").alias("part"), "k", "v"
    )
    return wrows.unionByName(conf)


def _x50_sql() -> str:
    pred = _X50_PRED
    gsel = ", ".join(
        f"sum(CAST(floor((({pred}) - CAST(y AS DOUBLE)) * x{j} "
        f"* 1000000.0) AS BIGINT)) AS g{j}"
        for j in range(4)
    )
    wup = ", ".join(
        f"w{j} - CAST(g{j} AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)) "
        f"AS w{j}"
        for j in range(4)
    )
    wlast = f"wc{_X50_ROUNDS}"
    wout = " UNION ALL ".join(
        f"SELECT 'w' AS part, 'w{j}' AS k, "
        f"CAST(floor(w{j} * 1000000000.0) AS BIGINT) AS v FROM {wlast}"
        for j in range(4)
    )
    rounds = ""
    for r in range(1, _X50_ROUNDS + 1):
        rounds += (
            f"s{r} AS (SELECT {gsel}, count(*) AS n "
            f"FROM f CROSS JOIN wc{r - 1}), "
            f"wc{r} AS (SELECT {wup} FROM wc{r - 1} CROSS JOIN s{r}), "
        )
    return (
        "WITH f AS (SELECT 1.0 AS x0, "
        "CAST(len(w_) AS DOUBLE) / 256.0 AS x1, "
        "CAST(len(list_distinct(w_)) AS DOUBLE) / 256.0 AS x2, "
        "CAST(len(list_filter(w_, x -> length(x) > 5)) AS DOUBLE) "
        "/ 256.0 AS x3, "
        "CASE WHEN 2 * len(list_distinct(w_)) > len(w_) "
        "THEN 1 ELSE 0 END AS y "
        f"FROM (SELECT {_WORDS_DUCK} AS w_ FROM documents)), "
        "wc0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3), "
        + rounds +
        "ym AS (SELECT CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
        "AS t FROM f), "
        "conf AS (SELECT y, "
        f"CASE WHEN ({pred}) > t THEN 1 ELSE 0 END AS p, "
        f"CAST(count(*) AS BIGINT) AS v FROM f CROSS JOIN {wlast} "
        "CROSS JOIN ym GROUP BY 1, 2) "
        f"{wout} "
        "UNION ALL SELECT 'conf', 'y' || y || '_p' || p, v FROM conf"
    )


# --------------------------------------------------------------------------
# X56 — readability grading (Flesch–Kincaid with a vowel-run syllable
# heuristic)
# --------------------------------------------------------------------------

_X56_GRADE_SQL = (
    "CAST(floor((CAST(0.39 AS DOUBLE) * "
    "(CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE)) "
    "+ CAST(11.8 AS DOUBLE) * "
    "(CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)) "
    "- CAST(15.59 AS DOUBLE)) * CAST(1000 AS DOUBLE)) AS BIGINT)"
)


def x56_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56 — per-document READABILITY grading (Flesch–Kincaid grade
    level) rolled into per-language histogram bands: the
    curriculum/difficulty axis of corpus curation (pair it with x26/x36
    perplexity and x50's probe to stratify training mixes by reading
    level). Sentences are ``[.!?]+`` runs, syllables the classic
    vowel-run heuristic (``[aeiouy]+`` groups in lowercased text) —
    both deterministic regexp counts, no dictionary. The FK polynomial
    is evaluated in DOUBLE with every literal explicitly CAST (a bare
    ``0.39`` parses as DECIMAL in Spark and divides differently — the
    x27 lesson) and each doc's grade floor-quantizes to e3 integers
    BEFORE any cross-row sum, so the per-band sums are
    order-independent integer math. Bands shift by +100 grades before
    the integer divide: grades can be negative and Spark ``DIV``
    truncates toward zero while DuckDB ``//`` floors — identical only
    on non-negative operands.

    Scale shape: one narrow map over ``text`` (three regexp counts +
    arithmetic, whole-stage codegen) then ONE hash-agg keyed
    (lang, band) — output is |langs|×|bands| rows at any corpus size;
    at 100 TB this is a single pruned-column pass, the same geometry
    as x4. Reference anchor: the reference has no text analytics
    (collector.py:182 concatenates title+description only); this is
    the curation layer on top."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            F.expr(f"size({_WORDS_SPARK})").alias("n_words"),
            F.expr(
                "greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
            ).alias("n_sent"),
            F.expr(
                "greatest(size(regexp_extract_all(lower(text), "
                "'[aeiouy]+', 0)), 1)"
            ).alias("n_syll"),
        )
        .filter(F.col("n_words") >= 1)
        .select("lang", F.expr(_X56_GRADE_SQL).alias("grade_e3"))
        .select(
            "lang",
            "grade_e3",
            F.expr("(grade_e3 + 100000) DIV 3000").alias("band"),
        )
        .groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("grade_e3").cast("bigint").alias("sum_grade_e3"),
        )
    )


_X56_SQL = (
    "WITH d AS (SELECT lang, "
    f"len({_WORDS_DUCK}) AS n_words, "
    "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent, "
    "greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) "
    "AS n_syll "
    "FROM documents), "
    "g AS (SELECT lang, "
    f"{_X56_GRADE_SQL} AS grade_e3 "
    "FROM d WHERE n_words >= 1) "
    "SELECT lang, (grade_e3 + 100000) // 3000 AS band, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(grade_e3) AS BIGINT) AS sum_grade_e3 "
    "FROM g GROUP BY 1, 2"
)


# --------------------------------------------------------------------------
# X73 — unigram-LM tokenizer training (SentencePiece-family, Viterbi-EM)
# --------------------------------------------------------------------------

_X73_M = 3          # max piece length (chars)
_X73_SEED_K = 48    # multi-char seed pieces kept (top by weighted count)
_X73_BIG = 10**15   # disallowed-piece sentinel (dwarfs any real path)


def _x73_cand_spark(bests: str, pvar: str) -> str:
    """Candidate costs for segmenting position ``pvar``: piece start
    j = p - M + t for t in 1..M (ascending j ⇒ the array_position
    tie-break picks the SMALLEST start = LONGEST piece, same both
    engines); out-of-range starts yield NULL, which array_min skips."""
    m = _X73_M
    return (
        f"transform(sequence(1, {m}), t -> IF({pvar} - {m} + t >= 1, "
        f"try_element_at({bests}, {pvar} - {m} + t) + coalesce("
        f"try_element_at(m, substring(word, {pvar} - {m} + t, "
        f"{m} + 1 - t)), CAST({_X73_BIG} AS BIGINT)), "
        "CAST(NULL AS BIGINT)))"
    )


_X73_BESTS = (
    "aggregate(sequence(1, length(word)), array(CAST(0 AS BIGINT)), "
    f"(bests, p) -> array_append(bests, "
    f"array_min({_x73_cand_spark('bests', 'p')})))"
)
_X73_BACKS = (
    f"transform(sequence(1, length(word)), p -> p - {_X73_M} + "
    f"array_position({_x73_cand_spark('bests', 'p')}, "
    f"array_min({_x73_cand_spark('bests', 'p')})))"
)
# Backward walk: at most length(word) steps; each appends the piece
# ending at `cur` and jumps to its start - 1 (the x28-style fixed
# unroll, expressed as a fold with an early no-op once cur hits 0)
_X73_PS = (
    "aggregate(sequence(1, length(word)), "
    "named_struct('cur', CAST(length(word) AS BIGINT), "
    "'ps', CAST(array() AS array<string>)), "
    "(acc, x) -> IF(acc.cur <= 0, acc, named_struct("
    "'cur', element_at(backs, CAST(acc.cur AS INT)) - 1, "
    "'ps', array_append(acc.ps, substring(word, "
    "element_at(backs, CAST(acc.cur AS INT)), "
    "acc.cur - element_at(backs, CAST(acc.cur AS INT)) + 1)))), "
    "acc -> acc.ps)"
)


def _x73_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one corpus pass (x41's shape): word → weight, checkpointed
    eagerly because every EM round consumes it through broadcast
    subplans."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(_WORDS_SPARK)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
        .localCheckpoint(eager=True)
    )


def _x73_seed_counts(words: DataFrame) -> DataFrame:
    """Seed vocabulary: every single character (coverage guarantee —
    chars are never pruned, SentencePiece's required-character rule)
    plus the top ``_X73_SEED_K`` substrings of length 2..M by weighted
    occurrence count (overlaps counted — the standard substring-seed).
    Vocab-sized: ≤ L·M substring rows per DISTINCT word."""
    m = _X73_M
    subs = (
        words.select(
            "wt",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(word)), j -> "
                    f"filter(transform(sequence(1, {m}), l -> "
                    "IF(j + l - 1 <= length(word), "
                    "substring(word, j, l), CAST(NULL AS STRING))), "
                    "x -> x IS NOT NULL)))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("wt").cast("long").alias("cnt"))
    )
    chars = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(_X73_SEED_K)
    )
    return chars.unionByName(multi)


def _x73_costs(counts: DataFrame) -> DataFrame:
    """(piece, cnt) → (piece, cnt, cost_e9): cost = lnq(total) −
    lnq(cnt) with lnq(x) = floor(1e9·portable_ln(x)) — both arguments
    are positive integers, the exact regime the portable ln was built
    for, and the subtraction of two independently-quantized integers is
    order-independent and bit-identical cross-engine."""
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _portable_ln,
    )

    wall = Window.partitionBy()
    a = (
        counts.withColumn("total", F.sum("cnt").over(wall))
        .withColumn("lx", F.col("cnt").cast("double"))
        .transform(_portable_ln, "ln_c")
        .select("piece", "cnt", "total", "ln_c")
    )
    return (
        a.withColumn("lx", F.col("total").cast("double"))
        .transform(_portable_ln, "ln_t")
        .select(
            "piece",
            "cnt",
            F.expr(
                "CAST(floor(ln_t * 1e9) AS BIGINT) "
                "- CAST(floor(ln_c * 1e9) AS BIGINT)"
            ).alias("cost_e9"),
        )
    )


def _x73_seg(words: DataFrame, model: DataFrame) -> DataFrame:
    """Viterbi-segment every vocabulary word under the model's piece
    costs: (word, wt, ps, nll). The model rides a 1-row map broadcast
    (map_from_entries over the vocab-sized cost table); the DP is one
    pure-map fold per word — integer costs, so both engines agree
    exactly whatever their evaluation shape (the DuckDB twin walks the
    same DP as a recursive CTE)."""
    m = model.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "cost_e9"))
        ).alias("m")
    )
    return (
        words.crossJoin(F.broadcast(m))
        .withColumn("bests", F.expr(_X73_BESTS))
        .withColumn("backs", F.expr(_X73_BACKS))
        .withColumn(
            "nll", F.expr("element_at(bests, length(word) + 1)")
        )
        .withColumn("ps", F.expr(_X73_PS))
        .select("word", "wt", "ps", "nll")
    )


def _x73_counts(seg: DataFrame) -> DataFrame:
    return (
        seg.select("wt", F.explode("ps").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wt").cast("long").alias("cnt"))
    )


def _x73_trained(spark: SparkSession, sf_dir: str):
    """The shared two-round hard-EM trainer: returns (model1, seg2,
    counts2) — the re-estimated model, the final segmentation frame,
    and the final piece counts. Single source for x73 (certificate)
    and x73b (fertility audit)."""
    words = _x73_words(spark, sf_dir)
    seed = _x73_seed_counts(words)
    model0 = _x73_costs(seed)
    counts1 = _x73_counts(_x73_seg(words, model0)).localCheckpoint(
        eager=True
    )
    # chars are never pruned (coverage); unused ones re-enter with a
    # floor count of 1. Multi-char pieces the round-1 segmentation
    # never used drop out — the EM prune.
    missing_chars = (
        seed.filter(F.length("piece") == 1)
        .join(counts1, "piece", "left_anti")
        .select("piece", F.lit(1).cast("long").alias("cnt"))
    )
    vocab2 = counts1.unionByName(missing_chars)
    model1 = _x73_costs(vocab2).localCheckpoint(eager=True)
    seg2 = _x73_seg(words, model1)
    counts2 = _x73_counts(seg2)
    return model1, seg2, counts2


def x73_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X73 — UNIGRAM-LM tokenizer training (Kudo 2018, the
    SentencePiece family; VERDICT r11 item 5), the production
    complement to x41's BPE: seed a substring vocabulary (all single
    chars + the top weighted substrings ≤ 3 chars), then two unrolled
    hard-EM rounds — Viterbi-segment every vocabulary word under the
    current piece costs (costs = e9-quantized −ln p on the portable
    ln), re-estimate counts from the segmentations, prune multi-char
    pieces the corpus stopped using (chars never prune —
    SentencePiece's character-coverage rule, floor count 1). The
    Viterbi DP runs as ONE whole-stage-codegen fold per word (forward
    best-cost array, backpointers, backward piece walk — integer
    costs, deterministic smallest-start tie-break), and the DuckDB
    oracle replays the exact DP as recursive CTEs: same costs, same
    tie-breaks, bit-equal.

    Certificate: the trained vocabulary — every piece the final
    segmentation uses with its count and model cost — plus a
    ``__nll__`` summary row carrying Σ wt·pathcost (the corpus
    negative log-likelihood in e9 units): a wrong cost, a wrong DP
    transition, or a wrong prune anywhere flips a row.

    Scale shape: ONE corpus shuffle (word → weight; Heaps-sublinear
    vocabulary), then everything is vocab-sized — substring seeding ≤
    L·M rows per distinct word, each EM round a 1-row map broadcast +
    a pure-map DP over the VOCAB + a piece-keyed aggregate. Nothing
    corpus-sized moves after the first aggregate; at 100 TB the two
    rounds cost two vocab-sized shuffles, exactly like x41's merge
    rounds."""
    model1, seg2, counts2 = _x73_trained(spark, sf_dir)
    pieces = counts2.join(
        model1.select("piece", "cost_e9"), "piece"
    ).select(
        "piece",
        F.length("piece").cast("bigint").alias("n_chars"),
        "cnt",
        "cost_e9",
    )
    nll = seg2.agg(
        F.lit("__nll__").alias("piece"),
        F.lit(0).cast("bigint").alias("n_chars"),
        F.sum("wt").cast("bigint").alias("cnt"),
        F.sum(F.col("wt") * F.col("nll")).cast("bigint").alias("cost_e9"),
    )
    return pieces.unionByName(nll)


def x73b_unigram_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X73b — per-LANGUAGE fertility audit under the x73-trained
    unigram tokenizer (x66's frame over the OTHER tokenizer family):
    tokens/word, chars/token and compression by ``lang``, derived from
    the SAME trained segmentation x73 certifies (word → Viterbi token
    count rides a 1-row map broadcast; per-doc token counts are a pure
    map over the documents' word arrays). Side-by-side with x66 this
    is the tokenizer bake-off a multilingual pipeline runs: same
    corpus, same integer-bp metrics, BPE vs unigram. One corpus-pass
    map stage + a |langs|-row aggregate — the x66 scale shape."""
    _model1, seg2, _counts2 = _x73_trained(spark, sf_dir)
    wm = seg2.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct("word", F.size("ps").cast("long").alias("tl"))
            )
        ).alias("wm")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    per_doc = docs.crossJoin(F.broadcast(wm)).select(
        "lang",
        F.expr(f"size({_WORDS_SPARK})").cast("bigint").alias("n_words"),
        F.expr(
            f"coalesce(aggregate(transform({_WORDS_SPARK}, "
            "word -> CAST(length(word) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x), 0)"
        ).cast("bigint").alias("n_syms"),
        F.expr(
            f"coalesce(aggregate(transform({_WORDS_SPARK}, "
            "word -> element_at(wm, word)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x), 0)"
        ).cast("bigint").alias("n_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("words"),
            F.sum("n_syms").cast("bigint").alias("syms"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "words",
            "syms",
            "tokens",
            F.expr("(10000 * tokens) DIV nullif(words, 0)")
            .cast("bigint")
            .alias("fertility_bp"),
            F.expr("(10000 * syms) DIV nullif(tokens, 0)")
            .cast("bigint")
            .alias("chars_per_token_bp"),
            F.expr("(10000 * (syms - tokens)) DIV nullif(syms, 0)")
            .cast("bigint")
            .alias("compress_bp"),
        )
    )


def _x73_cand_duck(pref: str, pvar: str) -> str:
    """DuckDB twin of ``_x73_cand_spark`` for row prefix ``pref`` and
    position expression ``pvar`` (candidate list ascends j, so
    list_position's first-match = smallest start, matching Spark)."""
    m = _X73_M
    return (
        f"list_transform([{', '.join(str(t) for t in range(1, m + 1))}], "
        f"t -> CASE WHEN {pvar} - {m} + t >= 1 THEN "
        f"{pref}bests[CAST({pvar} - {m} + t AS INT)] + coalesce("
        f"map_extract(mt.m, substr({pref}word, "
        f"CAST({pvar} - {m} + t AS INT), CAST({m} + 1 - t AS INT)))[1], "
        f"CAST({_X73_BIG} AS BIGINT)) END)"
    )


def _x73_viterbi_ctes(r: int, model_cte: str) -> str:
    """One EM round's Viterbi as recursive CTEs: ``mt{r}`` (piece→cost
    map), ``fwd{r}`` (forward best-cost lists), ``bwd{r}`` (backward
    piece walk), ``term{r}`` (per-word pieces + path cost). Integer
    costs make the recursive-CTE evaluation agree exactly with Spark's
    fold."""
    ccf = _x73_cand_duck("f.", "f.i + 1").replace("mt.m", f"mt{r}.m")
    ccb = _x73_cand_duck("b.", "b.cur").replace("mt.m", f"mt{r}.m")
    return (
        f"mt{r} AS (SELECT map(list(piece ORDER BY piece), "
        f"list(cost_e9 ORDER BY piece)) AS m FROM {model_cte}), "
        f"fwd{r} AS ("
        "SELECT word, wt, 0 AS i, [CAST(0 AS BIGINT)] AS bests "
        "FROM words "
        "UNION ALL "
        "SELECT f.word, f.wt, f.i + 1, "
        f"list_append(f.bests, list_aggregate({ccf}, 'min')) "
        f"FROM fwd{r} f CROSS JOIN mt{r} WHERE f.i < length(f.word)), "
        f"fin{r} AS (SELECT word, wt, bests FROM fwd{r} "
        "WHERE i = length(word)), "
        f"bwd{r} AS ("
        "SELECT word, wt, CAST(length(word) AS BIGINT) AS cur, "
        f"CAST([] AS VARCHAR[]) AS ps, bests FROM fin{r} "
        "UNION ALL "
        "SELECT word, wt, j - 1, "
        "list_append(ps, substr(word, CAST(j AS INT), "
        "CAST(cur - j + 1 AS INT))), bests "
        "FROM (SELECT b.word, b.wt, b.cur, b.ps, b.bests, "
        f"b.cur - {_X73_M} + list_position({ccb}, "
        f"list_aggregate({ccb}, 'min')) AS j "
        f"FROM bwd{r} b CROSS JOIN mt{r} WHERE b.cur > 0)), "
        f"term{r} AS (SELECT w.word, w.wt, w.ps, "
        "f.bests[length(w.word) + 1] AS nll "
        f"FROM bwd{r} w JOIN fin{r} f USING (word) WHERE w.cur = 0)"
    )


def _x73_costs_ctes(r: str, counts_cte: str) -> str:
    """DuckDB twin of ``_x73_costs``: cost{r} = lnq(total) − lnq(cnt)
    over ``counts_cte`` (piece, cnt), on the portable ln."""
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _portable_ln_ctes,
    )

    return (
        f"sc{r} AS (SELECT piece, cnt, "
        f"CAST(sum(cnt) OVER () AS BIGINT) AS total FROM {counts_cte}), "
        f"la{r}0 AS (SELECT piece, cnt, total, CAST(cnt AS DOUBLE) AS lx "
        f"FROM sc{r}), "
        + _portable_ln_ctes(f"la{r}0", f"la{r}", "piece, cnt, total",
                            "ln_c")
        + ", "
        f"lb{r}0 AS (SELECT piece, cnt, ln_c, CAST(total AS DOUBLE) "
        f"AS lx FROM la{r}6), "
        + _portable_ln_ctes(f"lb{r}0", f"lb{r}", "piece, cnt, ln_c",
                            "ln_t")
        + ", "
        f"cost{r} AS (SELECT piece, cnt, "
        "CAST(floor(ln_t * 1e9) AS BIGINT) "
        f"- CAST(floor(ln_c * 1e9) AS BIGINT) AS cost_e9 FROM lb{r}6)"
    )


def _x73_prefix() -> str:
    """Shared DuckDB WITH-body: words → seed → model0 → round-1
    Viterbi → re-estimated model1 → round-2 Viterbi. Used by both the
    x73 certificate and the x73b fertility rollup."""
    m = _X73_M
    return (
        "WITH RECURSIVE "
        "words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS wt "
        f"FROM (SELECT unnest({_WORDS_DUCK}) AS w FROM documents) "
        "GROUP BY 1), "
        "subs AS (SELECT piece, CAST(sum(wt) AS BIGINT) AS cnt FROM ("
        "SELECT wt, unnest(flatten(list_transform("
        "range(1, length(word) + 1), j -> list_filter(list_transform("
        f"range(1, {m + 1}), l -> CASE WHEN j + l - 1 <= length(word) "
        "THEN substr(word, CAST(j AS INT), CAST(l AS INT)) END), "
        "x -> x IS NOT NULL)))) AS piece FROM words) GROUP BY 1), "
        "chars0 AS (SELECT piece, cnt FROM subs WHERE length(piece) = 1), "
        "multi0 AS (SELECT piece, cnt FROM subs WHERE length(piece) > 1 "
        f"ORDER BY cnt DESC, piece LIMIT {_X73_SEED_K}), "
        "seed AS (SELECT * FROM chars0 UNION ALL SELECT * FROM multi0), "
        + _x73_costs_ctes("0", "seed") + ", "
        + _x73_viterbi_ctes(0, "cost0") + ", "
        "counts1 AS (SELECT piece, CAST(sum(wt) AS BIGINT) AS cnt FROM ("
        "SELECT wt, unnest(ps) AS piece FROM term0) GROUP BY 1), "
        "vocab2 AS (SELECT piece, cnt FROM counts1 "
        "UNION ALL SELECT c.piece, CAST(1 AS BIGINT) FROM chars0 c "
        "WHERE NOT EXISTS (SELECT 1 FROM counts1 k "
        "WHERE k.piece = c.piece)), "
        + _x73_costs_ctes("1", "vocab2") + ", "
        + _x73_viterbi_ctes(1, "cost1") + ", "
        "counts2 AS (SELECT piece, CAST(sum(wt) AS BIGINT) AS cnt FROM ("
        "SELECT wt, unnest(ps) AS piece FROM term1) GROUP BY 1) "
    )


def _x73_sql() -> str:
    return (
        _x73_prefix()
        + "SELECT c.piece, CAST(length(c.piece) AS BIGINT) AS n_chars, "
        "c.cnt, m.cost_e9 FROM counts2 c JOIN cost1 m USING (piece) "
        "UNION ALL "
        "SELECT '__nll__', CAST(0 AS BIGINT), "
        "CAST(sum(wt) AS BIGINT), CAST(sum(wt * nll) AS BIGINT) "
        "FROM term1"
    )


def _x73b_sql() -> str:
    return (
        _x73_prefix()
        + ", tl AS (SELECT word, CAST(len(ps) AS BIGINT) AS tl "
        "FROM term1), "
        "wm AS (SELECT map(list(word ORDER BY word), "
        "list(tl ORDER BY word)) AS m FROM tl), "
        "encd AS (SELECT lang, "
        f"CAST(len({_WORDS_DUCK}) AS BIGINT) AS n_words, "
        f"CAST(coalesce(list_sum(list_transform({_WORDS_DUCK}, "
        "word -> CAST(length(word) AS BIGINT))), 0) AS BIGINT) AS n_syms, "
        f"CAST(coalesce(list_sum(list_transform({_WORDS_DUCK}, "
        "word -> map_extract(wm.m, word)[1])), 0) AS BIGINT) AS n_tokens "
        "FROM documents CROSS JOIN wm) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_words) AS BIGINT) AS words, "
        "CAST(sum(n_syms) AS BIGINT) AS syms, "
        "CAST(sum(n_tokens) AS BIGINT) AS tokens, "
        "CAST((10000 * sum(n_tokens)) // nullif(sum(n_words), 0) "
        "AS BIGINT) AS fertility_bp, "
        "CAST((10000 * sum(n_syms)) // nullif(sum(n_tokens), 0) "
        "AS BIGINT) AS chars_per_token_bp, "
        "CAST((10000 * (sum(n_syms) - sum(n_tokens))) "
        "// nullif(sum(n_syms), 0) AS BIGINT) AS compress_bp "
        "FROM encd GROUP BY 1"
    )


QUERIES = {
    "x4_doc_stats": x4_doc_stats,
    "x4b_lang_profile": x4b_lang_profile,
    "x4c_fingerprint": x4c_fingerprint,
    "x4d_langid_ngram": x4d_langid_ngram,
    "x4e_bpe_token_stats": x4e_bpe_token_stats,
    "x41_bpe_train": x41_bpe_train,
    "x41b_bpe_encode": x41b_bpe_encode,
    "x66_tokenizer_fertility": x66_tokenizer_fertility,
    "x73_unigram_train": x73_unigram_train,
    "x73b_unigram_fertility": x73b_unigram_fertility,
    "x50_quality_probe": x50_quality_probe,
    "x56_readability": x56_readability,
}

ORACLES = {
    "x4_doc_stats": _X4_SQL,
    "x4b_lang_profile": _X4B_SQL,
    "x4c_fingerprint": _X4C_SQL,
    "x4d_langid_ngram": _X4D_SQL,
    "x4e_bpe_token_stats": _X4E_SQL,
    "x41_bpe_train": _X41_SQL,
    "x41b_bpe_encode": _x41b_sql(),
    "x66_tokenizer_fertility": _x66_sql(),
    "x73_unigram_train": _x73_sql(),
    "x73b_unigram_fertility": _x73b_sql(),
    "x50_quality_probe": _x50_sql(),
    "x56_readability": _X56_SQL,
}
