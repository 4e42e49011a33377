"""Deduplication operators (SURVEY.md §2.10 X1/X2) over ``documents``.

Four variants, each a first-class training-data-pipeline operator:

* **x1_exact_dedup** — hash-groupBy exact dedup (``dropDuplicates`` with a
  deterministic keep-min-id rule so the oracle hash matches).
* **x2_minhash_near_dup** — MinHash + banded LSH near-dup detection:
  word-trigram shingles → 12 MinHash signatures → 4 bands × 3 rows →
  bucket-equijoin candidates → exact-Jaccard verification. The candidate
  join shuffles on band keys only — never all-pairs. This is the 100 TB
  shape (Broder MinHash / LSH banding); ``pyspark.ml.feature.MinHashLSH``
  implements the same idea, but hand-rolled md5 hashing keeps every step
  reproducible in the DuckDB oracle.
* **x2b_simhash_groups** — 16-bit SimHash (Charikar) over the same
  shingles; docs sharing a fingerprint form candidate groups. One shuffle
  on the fingerprint.
* **x2c_ngram_jaccard_pairs** — exact all-pairs trigram Jaccard on a
  bounded id-slice: the brute-force oracle twin of x2 (at 100 TB the
  slice is a blocking key; the full corpus goes through x2).

The fixture corpus has no literal duplicates, so each operator plants
deterministic duplicates from the fixture itself (same derivation in Spark
and SQL): exact copies for X1, 3-appended-words near-copies for X2.

Reference anchor: the reference dedups ingested articles by guid with a
Python list ledger (/root/reference/news_insights/collector.py:36-63,87-89);
these operators are the content-level generalization its pipeline lacks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.plans.cache import scoped_persist

# --- shared shingle derivation (identical semantics in Spark + DuckDB) -----

#: Spark-side word-trigram shingle array from `text` (0-based array lambda).
_SHINGLES_SPARK = (
    "CASE WHEN size(w) >= 3 THEN "
    "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])) "
    "ELSE array() END"
)

#: DuckDB-side equivalent (1-based list indexing).
_SHINGLES_DUCK = (
    "list_transform(range(1, greatest(len(w)-1, 1)), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"
)

_WORDS_SPARK = "filter(split(text, ' '), x -> x != '')"
_WORDS_DUCK = "list_filter(string_split(text, ' '), x -> x <> '')"

_N_HASHES = 12
_BANDS = 4  # 4 bands x 3 rows; P(candidate) = 1-(1-s^3)^4
_ROWS_PER_BAND = _N_HASHES // _BANDS
_JACCARD_THRESHOLD = 0.8


def _near_dup_corpus(docs: DataFrame) -> DataFrame:
    """Fixture corpus + planted near-duplicates (docs ending in 0 get a
    copy with 3 appended words → trigram Jaccard ≈ 0.93).

    The fixed +1e6 id namespace is a FIXTURE device (valid while the
    fixture corpus stays < 1M docs; the shipped SFs top out at 55k) —
    it only names the planted rows, no operator filter keys on it.
    Where an id threshold IS operator semantics (x30's delta probe,
    x34's quote twins), the namespace derives from max(doc_id)+1
    instead."""
    base = docs.select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xdup ydup zdup")).alias("text"),
    )
    return base.unionByName(planted)


_NEAR_DUP_CORPUS_SQL = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL "
    "SELECT doc_id + 1000000, text || ' xdup ydup zdup' FROM documents "
    "WHERE doc_id % 10 = 0"
)


def _shingle_rows(corpus: DataFrame) -> DataFrame:
    """Distinct (doc_id, sh) word-trigram shingle rows.

    Deduped with per-row ``array_distinct`` BEFORE the explode: the
    set semantics are per-document, so a global ``.distinct()`` (a full
    shuffle of every shingle row — the r2 shape) buys nothing a map-side
    array op doesn't. One less shuffle on the hottest intermediate."""
    return corpus.withColumn("w", F.expr(_WORDS_SPARK)).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(_SHINGLES_SPARK))).alias("sh"),
    )


_SHINGLE_ROWS_SQL = (
    "SELECT doc_id, unnest(list_distinct({shingles})) AS sh FROM ("
    f"  SELECT doc_id, {_WORDS_DUCK} AS w FROM corpus)"
).format(shingles=_SHINGLES_DUCK)


# --------------------------------------------------------------------------
# X1 — exact dedup
# --------------------------------------------------------------------------


def x1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one shuffle on md5(text), keep the
    minimum doc_id per group (deterministic, unlike dropDuplicates'
    arbitrary-row semantics). At 100 TB the group key is the 128-bit
    content hash, never the text itself — shuffle rows are (hash, id)."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(2000000)).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    return (
        corpus.groupBy(F.md5("text").alias("text_key"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_X1_SQL = (
    "WITH corpus AS ("
    "  SELECT doc_id, text FROM documents "
    "  UNION ALL "
    "  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 0) "
    "SELECT md5(text) AS text_key, min(doc_id) AS keep_id, "
    "count(*) AS n_copies FROM corpus GROUP BY 1"
)


# --------------------------------------------------------------------------
# X2 — MinHash + banded LSH near-dup
# --------------------------------------------------------------------------


def _signatures_and_candidates(sh: DataFrame) -> tuple[DataFrame, DataFrame]:
    """MinHash signatures (+ shingle counts) and banded-LSH candidate
    pairs from distinct (doc_id, sh) rows. Split out so the scale tests
    can measure |candidates| growth directly (tests/test_scale_growth.py).

    Hashing is Carter-Wegman: ONE md5 per shingle row yields two 32-bit
    halves (h1, h2); hash family i is (h1 + i*h2) mod 2^32. That is one
    digest + 12 integer expressions per row instead of 12 digests (the
    r2 shape), and the min-aggregates run over BIGINTs, not 32-char
    strings — measurably cheaper at sf0.1 and 12× less hashing at any
    scale. Exact-Jaccard verification downstream is unchanged, so the
    weaker pairwise independence only perturbs candidate recall (pinned
    ≥0.9 at two scales by tests/test_scale_growth.py).

    One aggregation produces the 12 signature mins AND the shingle
    count — folding the count in saves a second full shuffle over the
    shingle set (it feeds the Jaccard denominator later)."""
    sigs = _signatures(sh)
    bands = _band_rows(sigs)

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return sigs, cand


def _signatures(sh: DataFrame) -> DataFrame:
    """Carter-Wegman MinHash signatures + shingle counts per doc from
    distinct (doc_id, sh) rows — shared by x2's full self-join and
    x30's incremental probe, so the hash derivation can never
    desynchronize between the materialized index and the probe."""
    sig_aggs = [
        F.min(F.expr(f"pmod(h1 + {s} * h2, 4294967296)")).alias(f"s{s}")
        for s in range(_N_HASHES)
    ]
    return (
        sh.withColumn(
            "h1", F.expr("CAST(conv(substr(md5(sh), 1, 8), 16, 10) AS BIGINT)")
        )
        .withColumn(
            "h2", F.expr("CAST(conv(substr(md5(sh), 9, 8), 16, 10) AS BIGINT)")
        )
        .groupBy("doc_id")
        .agg(*sig_aggs, F.count(F.lit(1)).alias("n_sh"))
    )


def _band_rows(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) LSH band rows from minhash signatures."""
    stack_args = ", ".join(
        f"{b}, concat_ws(':', s{b * _ROWS_PER_BAND}, "
        f"s{b * _ROWS_PER_BAND + 1}, s{b * _ROWS_PER_BAND + 2})"
        for b in range(_BANDS)
    )
    return sigs.select(
        "doc_id", F.expr(f"stack({_BANDS}, {stack_args}) AS (band, bkey)")
    )


def x2_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-duplicate pairs with exact-Jaccard verification.

    Plan shape (all JVM built-ins, no Python):
      shingle explode → distinct → groupBy(doc) with 12 min-hash aggs
      → stack to 4 band rows → self-equijoin on (band, key) → distinct
      pairs → shingle-intersection join → Jaccard filter.
    The only joins are equi-joins on band keys and shingle strings —
    shuffle volume is O(shingles + candidates), never O(n²).
    """
    docs = load_table(spark, sf_dir, "documents")
    # The shingle set feeds three consumers (signatures, per-doc counts,
    # the intersection join); persisting computes the explode+distinct
    # once instead of three times. Shingle rows are ~|corpus|·|words|
    # short strings — MEMORY_AND_DISK spills safely at larger SF. The
    # scoped registry unpersists it when the next query starts.
    sh = scoped_persist(_shingle_rows(_near_dup_corpus(docs)))

    sigs, cand = _signatures_and_candidates(sh)
    counts = sigs.select("doc_id", "n_sh")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _x2_sql(corpus_sql: str = _NEAR_DUP_CORPUS_SQL) -> str:
    sig_cols = ", ".join(
        f"min((h1 + {s} * h2) % 4294967296) AS s{s}" for s in range(_N_HASHES)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"CAST(s{b * _ROWS_PER_BAND} AS VARCHAR) || ':' || "
        f"CAST(s{b * _ROWS_PER_BAND + 1} AS VARCHAR) || ':' || "
        f"CAST(s{b * _ROWS_PER_BAND + 2} AS VARCHAR) AS bkey FROM sigs"
        for b in range(_BANDS)
    )
    return (
        f"WITH corpus AS ({corpus_sql}), "
        f"dshingles AS ({_SHINGLE_ROWS_SQL}), "
        "hashed AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS h1, "
        "CAST(('0x' || substr(md5(sh), 9, 8)) AS BIGINT) AS h2 "
        "FROM dshingles), "
        f"sigs AS (SELECT doc_id, {sig_cols} FROM hashed GROUP BY doc_id), "
        f"bands AS ({band_selects}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "  FROM bands a JOIN bands b "
        "  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id), "
        "counts AS (SELECT doc_id, count(*) AS n_sh FROM dshingles GROUP BY 1), "
        "inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter "
        "  FROM cand c "
        "  JOIN dshingles sa ON sa.doc_id = c.doc_a "
        "  JOIN dshingles sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh "
        "  GROUP BY 1, 2) "
        "SELECT i.doc_a, i.doc_b, "
        "round(i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter), 4) AS jaccard "
        "FROM inter i "
        "JOIN counts ca ON ca.doc_id = i.doc_a "
        "JOIN counts cb ON cb.doc_id = i.doc_b "
        f"WHERE i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter) >= {_JACCARD_THRESHOLD}"
    )


# --------------------------------------------------------------------------
# X30 — incremental near-dup: dedup the DELTA against the corpus
# --------------------------------------------------------------------------


def _incremental_corpus(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(base ∪ delta, one-row offset frame): the delta batch contains
    planted near-duplicates of base docs (%10, +3 words) AND genuinely
    new content (%7==3, text reversed — shares no trigram with any
    original), so the probe must both find the dups and pass the
    novel docs through. Delta ids are namespaced at ``max(doc_id)+1``
    (dups land in [off, 2·off), fresh in [2·off, 3·off)) — derived,
    not a fixed constant, so base ids can never alias delta ids at any
    corpus size."""
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("off"))
    base = docs.select("doc_id", "text")
    dup_batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("off")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xdup ydup zdup")).alias("text"),
        )
    )
    fresh = (
        docs.filter(F.col("doc_id") % 7 == 3)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + 2 * F.col("off")).alias("doc_id"),
            F.reverse(F.col("text")).alias("text"),
        )
    )
    return base.unionByName(dup_batch).unionByName(fresh), off


def x30_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection — the production nightly-ingest
    shape: dedup ONLY the day's delta against the corpus, never re-run
    the whole-corpus pairwise pass. The delta's band rows PROBE the
    band index (here recomputed; in production it is the materialized
    table the full x2 run left behind, so the nightly cost is
    O(|delta| + probed buckets), independent of corpus size), and the
    delta side of the join is broadcast — a day's batch vs a 100 TB
    index never shuffles the index. Candidate orientation doc_a <
    doc_b with doc_b restricted to delta ids covers both old→new and
    new→new duplicates exactly once; exact-Jaccard verification is
    x2's, restricted to candidate docs. Planted dups are found (≈0.93
    Jaccard), reversed-text novel docs sail through — both certified
    by the oracle, which replays the same restriction."""
    docs = load_table(spark, sf_dir, "documents")
    corpus, off = _incremental_corpus(docs)
    sh = scoped_persist(_shingle_rows(corpus))
    sigs = _signatures(sh)
    bands = _band_rows(sigs)
    bands_new = (
        bands.crossJoin(F.broadcast(off))
        .filter(F.col("doc_id") >= F.col("off"))
        .drop("off")
    )
    a, b = bands.alias("a"), bands_new.alias("b")
    cand = (
        a.join(
            F.broadcast(b),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    counts = sigs.select("doc_id", "n_sh")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_X30_OFF_SQL = "(SELECT max(doc_id) + 1 FROM documents)"

_INCREMENTAL_CORPUS_SQL = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL "
    f"SELECT doc_id + {_X30_OFF_SQL}, text || ' xdup ydup zdup' "
    "FROM documents WHERE doc_id % 10 = 0 "
    "UNION ALL "
    f"SELECT doc_id + 2 * {_X30_OFF_SQL}, reverse(text) FROM documents "
    "WHERE doc_id % 7 = 3"
)


def _x30_sql() -> str:
    """x30's oracle rides the SAME parameterized round as st17's
    epochs (``_neardup_round_sql``) — one source of the probe SQL, so
    the batch-nightly and streaming shapes cannot drift — and projects
    the verified pairs with their Jaccard instead of the round's
    distinct-dups set."""
    return (
        f"WITH corpus AS ({_INCREMENTAL_CORPUS_SQL}), "
        + _neardup_round_sql("corpus", f"b.doc_id >= {_X30_OFF_SQL}", "r")
        + " "
        "SELECT i.doc_a, i.doc_b, "
        "round(i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter), 4) "
        "AS jaccard "
        "FROM rinter i "
        "JOIN rcounts ca ON ca.doc_id = i.doc_a "
        "JOIN rcounts cb ON cb.doc_id = i.doc_b "
        "WHERE i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter) "
        f">= {_JACCARD_THRESHOLD}"
    )


def _neardup_round_sql(corpus_cte: str, delta_pred: str, p: str) -> str:
    """One incremental near-dup round as a reusable CTE chain (the SQL
    twin of the probe x30 and st17 run per delta/micro-batch): over
    ``corpus_cte`` rows (doc_id, text) — corpus AND delta together —
    emit ``{p}dups`` = the delta doc_ids (rows satisfying
    ``delta_pred``, written against alias ``b``) that are near-dups
    (band-bucket candidates verified at exact Jaccard >=
    ``_JACCARD_THRESHOLD``) of ANY earlier doc. Chained by st17's
    oracle once per epoch so the corpus a later epoch dedups against
    includes the earlier epochs' admissions — the evolving-corpus
    semantics the streaming operator must reproduce."""
    sig_cols = ", ".join(
        f"min((h1 + {s} * h2) % 4294967296) AS s{s}"
        for s in range(_N_HASHES)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"CAST(s{b * _ROWS_PER_BAND} AS VARCHAR) || ':' || "
        f"CAST(s{b * _ROWS_PER_BAND + 1} AS VARCHAR) || ':' || "
        f"CAST(s{b * _ROWS_PER_BAND + 2} AS VARCHAR) AS bkey "
        f"FROM {p}sigs"
        for b in range(_BANDS)
    )
    shingles = _SHINGLE_ROWS_SQL.replace(
        "FROM corpus)", f"FROM {corpus_cte})"
    )
    return (
        f"{p}sh AS ({shingles}), "
        f"{p}hashed AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS h1, "
        "CAST(('0x' || substr(md5(sh), 9, 8)) AS BIGINT) AS h2 "
        f"FROM {p}sh), "
        f"{p}sigs AS (SELECT doc_id, {sig_cols} FROM {p}hashed "
        "GROUP BY doc_id), "
        f"{p}bands AS ({band_selects}), "
        f"{p}cand AS (SELECT DISTINCT a.doc_id AS doc_a, "
        f"b.doc_id AS doc_b FROM {p}bands a JOIN {p}bands b "
        "ON a.band = b.band AND a.bkey = b.bkey "
        f"AND a.doc_id < b.doc_id WHERE {delta_pred}), "
        f"{p}counts AS (SELECT doc_id, count(*) AS n_sh FROM {p}sh "
        "GROUP BY 1), "
        f"{p}inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter "
        f"FROM {p}cand c "
        f"JOIN {p}sh sa ON sa.doc_id = c.doc_a "
        f"JOIN {p}sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh "
        "GROUP BY 1, 2), "
        f"{p}dups AS (SELECT DISTINCT i.doc_b AS doc_id "
        f"FROM {p}inter i "
        f"JOIN {p}counts ca ON ca.doc_id = i.doc_a "
        f"JOIN {p}counts cb ON cb.doc_id = i.doc_b "
        "WHERE i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter) "
        f">= {_JACCARD_THRESHOLD})"
    )


# --------------------------------------------------------------------------
# X2b — SimHash candidate groups
# --------------------------------------------------------------------------

_SIMHASH_BITS = 16


def _simhash_exprs(instr_fn: str, shift_tpl: str) -> tuple[list[str], str]:
    """Build ([per-bit sum aggregates], fingerprint assembly) SQL fragments.

    One generator feeds both engines so the bit math cannot drift:
    hex digit p of md5(sh) contributes its bit k to simhash bit 4p+k,
    +1 when set, -1 when clear; fingerprint bit = sign of the sum.
    """
    sums = []
    for j in range(_SIMHASH_BITS):
        p, k = divmod(j, 4)
        digit = f"({instr_fn}('0123456789abcdef', substr(md5(sh), {p + 1}, 1)) - 1)"
        bit = shift_tpl.format(val=digit, k=k)
        sums.append(f"sum(CASE WHEN ({bit}) = 1 THEN 1 ELSE -1 END) AS b{j}")
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_SIMHASH_BITS)
    )
    return sums, fp


def x2b_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-16 candidate groups: fingerprint each doc, group identical
    fingerprints. Two shuffles total (doc agg, fingerprint agg); at 100 TB
    widen to 64 bits + banded sub-fingerprints for hamming-distance > 0."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_rows(_near_dup_corpus(docs))
    sums, fp_sql = _simhash_exprs("instr", "(shiftright({val}, {k}) & 1)")
    per_doc = sh.groupBy("doc_id").agg(*[F.expr(s) for s in sums])
    return (
        per_doc.select("doc_id", F.expr(fp_sql).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") >= 2)
    )


def _x2b_sql() -> str:
    sums, fp_sql = _simhash_exprs("strpos", "(({val} >> {k}) & 1)")
    sums_sql = ", ".join(sums)
    return (
        f"WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}), "
        f"dshingles AS ({_SHINGLE_ROWS_SQL}), "
        f"per_doc AS (SELECT doc_id, {sums_sql} FROM dshingles GROUP BY doc_id), "
        f"fp AS (SELECT doc_id, {fp_sql} AS simhash FROM per_doc) "
        "SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc "
        "FROM fp GROUP BY 1 HAVING count(*) >= 2"
    )


# --------------------------------------------------------------------------
# X2c — exact n-gram Jaccard on a bounded slice (brute-force twin of X2)
# --------------------------------------------------------------------------

_SLICE = 50  # doc_id < _SLICE plus their planted copies


def x2c_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise trigram Jaccard on an id-bounded block. The pair
    space is generated through the shingle equi-join (docs sharing at
    least one shingle), so even the 'brute force' path is an equi-join,
    not a cross join; the id bound is the blocking key."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = _near_dup_corpus(docs).filter(
        (F.col("doc_id") % 1000000) < _SLICE
    )
    sh = _shingle_rows(corpus)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        sa.join(sb, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_X2C_SQL = (
    f"WITH corpus AS (SELECT * FROM ({_NEAR_DUP_CORPUS_SQL}) "
    f"  WHERE doc_id % 1000000 < {_SLICE}), "
    f"dshingles AS ({_SHINGLE_ROWS_SQL}), "
    "counts AS (SELECT doc_id, count(*) AS n_sh FROM dshingles GROUP BY 1), "
    "inter AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS inter "
    "  FROM dshingles sa JOIN dshingles sb "
    "  ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id GROUP BY 1, 2) "
    "SELECT i.doc_a, i.doc_b, "
    "round(i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter), 4) AS jaccard "
    "FROM inter i "
    "JOIN counts ca ON ca.doc_id = i.doc_a "
    "JOIN counts cb ON cb.doc_id = i.doc_b "
    "WHERE i.inter * 1.0 / (ca.n_sh + cb.n_sh - i.inter) >= 0.5"
)


# --------------------------------------------------------------------------
# X2d — near-dup clusters (connected components over the pair graph)
# --------------------------------------------------------------------------

_CC_ITERS = 6


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", iters: int = _CC_ITERS
) -> DataFrame:
    """Connected components by min-label propagation, pure DataFrame ops:
    every node starts labeled with itself; each round replaces a node's
    label with the minimum label among itself and its neighbors. After
    ``iters`` rounds every node within graph distance ``iters`` of its
    component's minimum carries that minimum.

    A fixed iteration count keeps the plan action-free (no driver-side
    convergence loop); near-dup graphs are unions of small cliques —
    LSH pairs connect documents sharing bands — so the diameter is far
    below 6. For general graphs at scale, run the same body under a
    driver loop with an AQE-sized convergence check, or switch to the
    alternating large-star/small-star algorithm (same join+agg
    primitives, provably O(log n) rounds).

    Returns (node, component) with component = min node id reachable."""
    # Each round references the previous labels TWICE (neighbor join +
    # carry-through), so the lineage doubles per round: 2^iters copies
    # of the upstream pair pipeline. A persist is NOT enough — the
    # runtime would reuse cached blocks but the driver still builds the
    # exponentially-nested logical plan (measured: OOMs the driver at 6
    # rounds). localCheckpoint materializes each round's ~|nodes| rows
    # AND truncates the plan to a LogicalRDD — the standard lineage cut
    # for iterative DataFrame algorithms. On a cluster with executor
    # loss concerns, swap for reliable checkpoint(dir).
    edges = scoped_persist(
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    for _ in range(iters):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def x2d_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster rollup: MinHash pairs → connected components →
    one row per cluster (canonical representative = min doc_id, member
    count). This is the step that turns pairwise similarity into a
    keep-one-per-cluster dedup decision."""
    # pairs feeds both direction branches of the edge build — persist so
    # the whole MinHash pipeline runs once.
    pairs = scoped_persist(
        x2_minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    )
    comp = connected_components(pairs)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc"),
    )


def _x2d_sql() -> str:
    return (
        "WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ("
        + _x2_sql()
        + ")), "
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs), "
        "reach(node, label) AS ("
        "  SELECT u, u FROM edges "
        "  UNION "
        "  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node) "
        "SELECT component, count(*) AS n_docs, max(node) AS max_doc FROM ("
        "  SELECT node, min(label) AS component FROM reach GROUP BY 1) "
        "GROUP BY 1"
    )


# --------------------------------------------------------------------------
# X33 — canonical selection: keep-best-per-cluster dedup decisions
# --------------------------------------------------------------------------


def x33_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's terminal step — turn near-dup clusters into
    KEEP/DROP decisions with a QUALITY-aware canonical: within each
    connected component the longest text wins (tie → min doc_id), every
    other member drops. Production dedup never keeps "min doc_id" — it
    keeps the best-quality variant (the fuller page, the non-truncated
    crawl), which is exactly what length-ranking encodes here (the
    planted near-dups are base+3 words, so the operator must PREFER the
    planted copy over the original — a real discrimination, pinned by
    the oracle).

    Scale shape: clusters are unions of small cliques (bounded by the
    Jaccard threshold), so the per-component window ranks tiny groups;
    the only corpus-sized shuffles are the MinHash pipeline's own. The
    component labels come from the fixed-iteration min-label propagation
    (``connected_components``), same as x2d."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = _near_dup_corpus(docs)
    pairs = scoped_persist(
        x2_minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    )
    comp = connected_components(pairs)
    quality = corpus.select(
        "doc_id", F.length("text").cast("bigint").alias("text_len")
    )
    members = comp.join(
        quality, comp["node"] == quality["doc_id"]
    ).select("component", "doc_id", "text_len")
    w = Window.partitionBy("component").orderBy(
        F.desc("text_len"), F.asc("doc_id")
    )
    return members.select(
        "component",
        "doc_id",
        "text_len",
        F.when(F.row_number().over(w) == 1, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("decision"),
    )


def _x33_sql() -> str:
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
        f"q AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len "
        f"FROM ({_NEAR_DUP_CORPUS_SQL})) "
        "SELECT component, doc_id, text_len, "
        "CASE WHEN row_number() OVER (PARTITION BY component "
        "ORDER BY text_len DESC, doc_id ASC) = 1 "
        "THEN 'keep' ELSE 'drop' END AS decision "
        "FROM comp JOIN q ON q.doc_id = comp.node"
    )


# --------------------------------------------------------------------------
# X34 — cross-document substring duplication (ExactSubstr-style pass)
# --------------------------------------------------------------------------

_X34_WIN = 8  # window length in words (Lee et al. use 50 tokens; the
# fixture docs are short — the mechanics are length-independent)

_WIN8_SPARK = (
    "CASE WHEN size(w) >= 8 THEN "
    "transform(sequence(0, size(w)-8), i -> concat_ws(' ', "
    "w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7])) "
    "ELSE array() END"
)
_WIN8_DUCK = (
    "CASE WHEN len(w) >= 8 THEN "
    "list_transform(range(1, len(w)-6), i -> "
    "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || "
    "w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]) "
    "ELSE [] END"
)


def _x34_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus the planted "quoting" twins shared by x34/x34b:
    every 9th doc gets a synthetic twin embedding its first 12 words
    inside fresh text, ids derived from max(doc_id)+1."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("off"))
    quotes = (
        docs.filter(F.col("doc_id") % 9 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("off")).alias("doc_id"),
            F.concat(
                F.lit("quoted passage follows here "),
                F.array_join(
                    F.slice(F.expr(_WORDS_SPARK), 1, 12), " "
                ),
                F.lit(" end of quote trailing fresh words"),
            ).alias("text"),
        )
    )
    return docs.unionByName(quotes)


def x34_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document SUBSTRING duplication — the ExactSubstr-style
    pass of Lee et al.'s training-data dedup (arXiv:2107.06499): a span
    copied between documents is invisible to document-level MinHash
    (the rest of the texts differ) and to line dedup (the span needn't
    be a whole line), but every 8-word window inside it collides. Per
    document: total windows, windows shared with ANY other doc, and the
    duplicated fraction in basis points — the signal production
    pipelines use to cut or trim quoting/boilerplate spans.

    Planted discrimination: every 9th doc gets a synthetic "quoting"
    twin embedding its first 12 words inside fresh text — the pass must
    flag exactly the 5 shared windows on both sides while pure-fresh
    text sails through. Quote ids derive from max(doc_id)+1 (no fixed
    offsets — the x30 lesson).

    Scale shape: x19's count-join-filter lifted from lines to sliding
    windows — ONE shuffle keyed on md5(window) (32-byte keys, never
    window text), one doc_id rollup. Window volume is |words| per doc
    (each word starts one window), so the pass is linear in corpus
    tokens; never all-pairs anything."""
    corpus = _x34_corpus(spark, sf_dir)
    wins = (
        corpus.withColumn("w", F.expr(_WORDS_SPARK))
        .select("doc_id", F.explode(F.expr(_WIN8_SPARK)).alias("win"))
        .select("doc_id", F.md5("win").alias("h"))
        .distinct()
    )
    # wins is distinct on (doc_id, h), so count(*) per h IS the distinct
    # doc count — no countDistinct machinery needed; and only the SMALL
    # >=2-docs window set joins back (AQE broadcasts it at runtime), so
    # the 5.7M-row window stream crosses one exchange fewer than the
    # old full shuffle-join against per-window counts (r13, guide §2.4;
    # measured 2.76 -> see OPTIMIZATION_r13.md).
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        wins.join(dup_h, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dup_windows"),
        )
    )
    return per_doc.filter(F.col("n_dup_windows") > 0).select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        F.expr("(10000 * n_dup_windows) DIV n_windows")
        .cast("bigint")
        .alias("dup_bp"),
    )


_X34_OFF_SQL = "(SELECT max(doc_id) + 1 FROM documents)"

_X34_CORPUS_SQL = (
    "corpus AS (SELECT doc_id, text FROM documents "
    "UNION ALL "
    f"SELECT doc_id + {_X34_OFF_SQL}, "
    "'quoted passage follows here ' || "
    # coalesce: DuckDB string_agg over an EMPTY list is NULL (and ||
    # propagates it), while Spark array_join of an empty array is '' —
    # a whitespace-only fixture doc would silently diverge the twins
    f"coalesce(list_aggr(list_slice({_WORDS_DUCK}, 1, 12), "
    "'string_agg', ' '), '') || "
    "' end of quote trailing fresh words' "
    "FROM documents WHERE doc_id % 9 = 0)"
)

_X34_SQL = (
    f"WITH {_X34_CORPUS_SQL}, "
    "wins AS (SELECT DISTINCT doc_id, md5(win) AS h FROM ("
    f"SELECT doc_id, unnest({{win8}}) AS win FROM ("
    f"SELECT doc_id, {_WORDS_DUCK} AS w FROM corpus))), "
    "dfc AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM wins "
    "GROUP BY 1), "
    "per_doc AS (SELECT w.doc_id, "
    "CAST(count(*) AS BIGINT) AS n_windows, "
    "CAST(sum(CASE WHEN dfc.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_dup_windows "
    "FROM wins w JOIN dfc ON dfc.h = w.h GROUP BY 1) "
    "SELECT doc_id, n_windows, n_dup_windows, "
    "CAST((10000 * n_dup_windows) // n_windows AS BIGINT) AS dup_bp "
    "FROM per_doc WHERE n_dup_windows > 0"
).format(win8=_WIN8_DUCK)


def x40_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup — the pass that runs BEFORE
    hashing in every production pipeline (CCNet, RefinedWeb, Dolma):
    case-fold, collapse whitespace runs, trim, THEN group by content
    hash, so re-crawls and mirrors that differ only in casing or
    spacing collapse onto one canonical doc that byte-exact dedup (x1)
    is blind to. Planted discrimination: every 11th doc gets a twin
    that is its UPPERCASED text with doubled/trailing whitespace — raw
    hashes differ, normalized hashes collide, and the per-source
    collapsed count is exactly the twin count.

    Scale shape: normalization is a map-side expression chain (lower +
    one regexp + trim, whole-stage codegen), the distinct groups on
    md5(normalized) — 32-byte keys, never text — and the rollup is
    |sources|-keyed. One O(|docs|) shuffle total."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("off"))
    twins = (
        docs.filter(F.col("doc_id") % 11 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("off")).alias("doc_id"),
            "source",
            F.concat(F.upper("text"), F.lit("  ")).alias("text"),
        )
    )
    corpus = docs.unionByName(twins)
    h = F.md5(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    ).alias("h")
    return (
        corpus.select("source", h)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("h").cast("bigint").alias("n_norm_distinct"),
        )
        .withColumn(
            "n_collapsed",
            (F.col("n_docs") - F.col("n_norm_distinct")).cast("bigint"),
        )
    )


_X40_SQL = (
    "WITH corpus AS (SELECT doc_id, source, text FROM documents "
    "UNION ALL "
    f"SELECT doc_id + {_X34_OFF_SQL}, source, upper(text) || '  ' "
    "FROM documents WHERE doc_id % 11 = 0), "
    "n AS (SELECT source, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM corpus) "
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(count(DISTINCT h) AS BIGINT) AS n_norm_distinct, "
    "CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_collapsed "
    "FROM n GROUP BY 1"
)


def x34b_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span TRIMMING — the production half of Lee et al.'s
    substring pass (arXiv:2107.06499) that x34 only FLAGS: adjacent
    duplicated windows merge into spans (the union of their covered
    word positions) and those spans are cut from each document, keeping
    the fresh remainder. Per trimmed doc: word count before, words
    kept, and the md5 checksum of the retained text — a value-level
    certificate that both engines cut EXACTLY the same spans (an
    off-by-one in window→position coverage flips the hash).

    Same corpus and duplication criterion as x34 (windows shared by ≥2
    docs; the planted quoting twins discriminate). Scale shape: the
    md5(window) shuffle is x34's; coverage is one explode of ≤8
    positions per duplicated window folded to a per-doc SORTED POSITION
    ARRAY, and the retained text is a map-side ``filter(w, (x, i) ->
    ...)`` over each doc's own word array — the corpus words are never
    exploded or re-shuffled, only the (doc_id, covered-positions) pairs
    are (bounded by duplicated-window volume). Linear in corpus tokens,
    no all-pairs step anywhere."""
    corpus = _x34_corpus(spark, sf_dir)
    # persisted: winpos feeds TWO consumers (the dup-window detection
    # and the coverage join) and the broadcast probe join no longer
    # shares an exchange between them (r13 — the x46 precedent: compute
    # the explode + md5 once).
    winpos = scoped_persist(
        corpus.withColumn("w", F.expr(_WORDS_SPARK))
        .select(
            "doc_id", F.posexplode(F.expr(_WIN8_SPARK)).alias("p", "win")
        )
        .select("doc_id", "p", F.md5("win").alias("h"))
    )
    # count(*) over the distinct (doc_id, h) pairs == countDistinct
    # (r13); collect_set folds the positions dedup into the rollup agg
    # instead of a separate distinct exchange (set == sorted distinct
    # list after array_sort).
    dup_h = (
        winpos.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    covered = (
        winpos.join(dup_h, "h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("p"), F.col("p") + F.lit(_X34_WIN - 1)
                )
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("cov"))
    )
    return (
        corpus.withColumn("w", F.expr(_WORDS_SPARK))
        .join(covered, "doc_id")
        .withColumn(
            "kept_w",
            F.expr(
                "filter(w, (x, i) -> NOT array_contains(cov, i))"
            ),
        )
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_words"),
            F.size("kept_w").cast("bigint").alias("n_kept"),
            F.md5(F.array_join("kept_w", " ")).alias("retained_md5"),
        )
    )


_X34B_SQL = (
    f"WITH {_X34_CORPUS_SQL}, "
    f"ww AS (SELECT doc_id, {_WORDS_DUCK} AS w FROM corpus), "
    "winpos AS (SELECT doc_id, u['p'] AS p, md5(u['win']) AS h FROM ("
    "SELECT doc_id, unnest(list_transform({win8}, "
    "(x, i) -> {{'p': i - 1, 'win': x}})) AS u FROM ww)), "
    "dup_h AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS n_docs "
    "FROM (SELECT DISTINCT doc_id, h FROM winpos) GROUP BY 1) "
    "WHERE n_docs >= 2), "
    "covered AS (SELECT DISTINCT doc_id, pos FROM ("
    "SELECT wp.doc_id, unnest(range(wp.p, wp.p + 8)) AS pos "
    "FROM winpos wp JOIN dup_h ON dup_h.h = wp.h)), "
    "wordpos AS (SELECT doc_id, u['pos'] AS pos, u['word'] AS word FROM ("
    "SELECT doc_id, unnest(list_transform(w, "
    "(x, i) -> {{'pos': i - 1, 'word': x}})) AS u FROM ww)), "
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
).format(win8=_WIN8_DUCK)


# --------------------------------------------------------------------------
# X19 — corpus-level line dedup (boilerplate removal)
# --------------------------------------------------------------------------

_X19_BP1 = "subscribe to our newsletter today for updates"
_X19_BP2 = "all rights reserved by the publisher"
_X19_DF = 5  # a line present in >= this many distinct docs is boilerplate
_X19_MAX_LINES = 8  # fixture docs carry 1-3 lines; oracle range bound


def x19_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line deduplication, the CCNet/RefinedWeb boilerplate
    pass: a line that appears in ≥ ``_X19_DF`` distinct documents is
    removed from EVERY document (nav menus, subscribe prompts, legal
    footers); per document the result reports total/kept/dropped line
    counts plus the md5 + length of the reassembled cleaned text. The
    fixture corpus is single-line, so two boilerplate lines are planted
    deterministically (every 4th doc gets a subscribe prompt, every 6th
    a rights footer — both replayed by the oracle), and the operator
    must drop exactly those.

    Scale shape: two shuffles, both O(|lines|) — the document-frequency
    count groups on ``md5(line)`` (32-byte keys, never full line text),
    and the rejoin + per-doc rollup groups on doc_id. No window, no
    all-pairs anything; this is the same count-join-filter shape exact
    dedup (x1) uses, lifted from documents to lines. Reassembly order is
    pinned by the line's position, so the cleaned-text md5 is
    deterministic under any partitioning."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = docs.withColumn(
        "dirty",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit("\n" + _X19_BP1)
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0, F.lit("\n" + _X19_BP2)
            ).otherwise(F.lit("")),
        ),
    )
    lines = dirty.select(
        "doc_id",
        F.posexplode(F.split(F.col("dirty"), "\n")).alias("pos", "line"),
    ).withColumn("h", F.md5(F.col("line")))
    df_counts = lines.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    merged = lines.join(df_counts, "h")
    return (
        merged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("n_docs") < _X19_DF, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.expr(
                f"array_join(transform(filter(array_sort("
                f"collect_list(struct(pos, line, n_docs))), "
                f"s -> s.n_docs < {_X19_DF}), s -> s.line), '\\n')"
            ).alias("cleaned"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            (F.col("n_lines") - F.col("n_kept")).alias("n_dropped"),
            F.md5(F.col("cleaned")).alias("cleaned_md5"),
            F.length(F.col("cleaned")).cast("bigint").alias("cleaned_len"),
        )
    )


_X19_SQL = (
    "WITH d AS (SELECT doc_id, text || "
    f"CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_X19_BP1}' ELSE '' END || "
    f"CASE WHEN doc_id % 6 = 0 THEN chr(10) || '{_X19_BP2}' ELSE '' END "
    "AS dirty FROM documents), "
    "l0 AS (SELECT doc_id, string_split(dirty, chr(10)) AS ls FROM d), "
    "l AS (SELECT doc_id, i AS pos, ls[CAST(i AS INT)] AS line, "
    "md5(ls[CAST(i AS INT)]) AS h FROM l0 CROSS JOIN "
    f"(SELECT unnest(range(1, {_X19_MAX_LINES + 1})) AS i) t "
    "WHERE i <= len(ls)), "
    "c AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM l GROUP BY 1), "
    "j AS (SELECT l.doc_id, l.pos, l.line, c.n_docs FROM l "
    "JOIN c ON l.h = c.h) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
    f"CAST(sum(CASE WHEN n_docs < {_X19_DF} THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_kept, "
    f"CAST(count(*) - sum(CASE WHEN n_docs < {_X19_DF} THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_dropped, "
    f"md5(coalesce(string_agg(line, chr(10) ORDER BY pos) "
    f"FILTER (WHERE n_docs < {_X19_DF}), '')) AS cleaned_md5, "
    f"CAST(length(coalesce(string_agg(line, chr(10) ORDER BY pos) "
    f"FILTER (WHERE n_docs < {_X19_DF}), '')) AS BIGINT) AS cleaned_len "
    "FROM j GROUP BY doc_id"
)


# --------------------------------------------------------------------------
# X51 — sequential dedup ROI report (exact → normalized → near-dup)
# --------------------------------------------------------------------------


def _x51_dirty(docs: DataFrame) -> DataFrame:
    """The combined dirty corpus: base docs plus three planted
    duplicate families in disjoint derived-id namespaces — verbatim
    re-crawls (every 13th doc), case/whitespace mirrors (every 11th,
    x40's construction) and appended-words near-dups (every 10th,
    x2's construction)."""
    base = docs.select("doc_id", "text")
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("off"))
    exact = base.filter(F.col("doc_id") % 13 == 0).crossJoin(
        F.broadcast(off)
    ).select((F.col("doc_id") + F.col("off")).alias("doc_id"), "text")
    norm = base.filter(F.col("doc_id") % 11 == 0).crossJoin(
        F.broadcast(off)
    ).select(
        (F.col("doc_id") + 2 * F.col("off")).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    near = base.filter(F.col("doc_id") % 10 == 0).crossJoin(
        F.broadcast(off)
    ).select(
        (F.col("doc_id") + 3 * F.col("off")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xdup ydup zdup")).alias("text"),
    )
    return base.unionByName(exact).unionByName(norm).unionByName(near)


def x51_dedup_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X51 — the DEDUP ROI REPORT: run the three dedup passes the way
    a production pipeline sequences them — exact content hash, then
    normalization-aware hash, then MinHash near-dup — each over the
    SURVIVORS of the one before, and account what each pass removed in
    documents and tokens (basis points of the dirty corpus). This is
    the decision artifact curation teams rank passes by: verbatim
    re-crawls are cheapest to kill (one hash), near-dups cost a
    banded-LSH pass and should only ever pay for what the cheap
    passes missed — which the sequential accounting makes visible
    (an exact twin must NOT show up again in the near-dup row).

    Scale shape: passes 1–2 are md5-keyed windows (one shuffle each,
    32-byte keys); pass 3 is x2's banded MinHash + x2d's fixed-round
    components over the ALREADY-SHRUNK survivor corpus — running the
    expensive pass last is itself the scale decision this report
    justifies. Integer-only certificate (counts, token sums, bp)."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = _x51_dirty(docs)
    t = dirty.select(
        "doc_id",
        "text",
        F.expr(f"size({_WORDS_SPARK})").cast("bigint").alias("tok"),
        F.md5("text").alias("he"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("hn"),
    )
    w1 = Window.partitionBy("he").orderBy("doc_id")
    r1 = t.withColumn("rk1", F.row_number().over(w1))
    d1 = r1.filter(F.col("rk1") > 1)
    s1 = r1.filter(F.col("rk1") == 1)
    w2 = Window.partitionBy("hn").orderBy("doc_id")
    r2 = s1.withColumn("rk2", F.row_number().over(w2))
    d2 = r2.filter(F.col("rk2") > 1)
    s2 = scoped_persist(
        r2.filter(F.col("rk2") == 1).select("doc_id", "text", "tok")
    )
    sh = scoped_persist(_shingle_rows(s2))
    sigs, cand = _signatures_and_candidates(sh)
    counts = sigs.select("doc_id", "n_sh")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    nb = counts.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    pairs = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs)
    d3 = s2.join(
        comp.filter(F.col("component") != F.col("node")).select(
            F.col("node").alias("doc_id")
        ),
        "doc_id",
    )
    kept = s2.join(d3.select("doc_id"), "doc_id", "left_anti")
    total = t.agg(F.sum("tok").cast("bigint").alias("tt"))

    def _part(df: DataFrame, name: str) -> DataFrame:
        return (
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.coalesce(F.sum("tok"), F.lit(0))
                .cast("bigint")
                .alias("tokens"),
            )
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(name).alias("pass"),
                "n_docs",
                "tokens",
                F.expr("(10000 * tokens) DIV tt")
                .cast("bigint")
                .alias("share_bp"),
            )
        )

    return (
        _part(d1, "exact")
        .unionByName(_part(d2, "normalized"))
        .unionByName(_part(d3, "neardup"))
        .unionByName(_part(kept, "kept"))
    )


def _x51_sql() -> str:
    off = "(SELECT max(doc_id) + 1 FROM documents)"
    dirty = (
        "SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + {off}, text FROM documents "
        "WHERE doc_id % 13 = 0 "
        f"UNION ALL SELECT doc_id + 2 * {off}, upper(text) || '  ' "
        "FROM documents WHERE doc_id % 11 = 0 "
        f"UNION ALL SELECT doc_id + 3 * {off}, text || ' xdup ydup zdup' "
        "FROM documents WHERE doc_id % 10 = 0"
    )
    pairs_sql = _x2_sql("SELECT doc_id, text FROM s2")
    part = (
        "SELECT '{name}' AS pass, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(coalesce(sum(tok), 0) AS BIGINT) AS tokens, "
        "CAST((10000 * coalesce(sum(tok), 0)) // (SELECT tt FROM tot) "
        "AS BIGINT) AS share_bp FROM {src}"
    )
    return (
        f"WITH RECURSIVE dirty AS ({dirty}), "
        "t AS (SELECT doc_id, text, "
        f"CAST(len({_WORDS_DUCK}) AS BIGINT) AS tok, "
        "md5(text) AS he, "
        "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS hn "
        "FROM dirty), "
        "r1 AS (SELECT *, row_number() OVER "
        "(PARTITION BY he ORDER BY doc_id) AS rk1 FROM t), "
        "d1 AS (SELECT * FROM r1 WHERE rk1 > 1), "
        "s1 AS (SELECT * FROM r1 WHERE rk1 = 1), "
        "r2 AS (SELECT *, row_number() OVER "
        "(PARTITION BY hn ORDER BY doc_id) AS rk2 FROM s1), "
        "d2 AS (SELECT * FROM r2 WHERE rk2 > 1), "
        "s2 AS (SELECT doc_id, text, tok FROM r2 WHERE rk2 = 1), "
        f"pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})), "
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs), "
        "reach(node, label) AS ("
        "  SELECT u, u FROM edges "
        "  UNION "
        "  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node), "
        "comp AS (SELECT node, min(label) AS component FROM reach "
        "GROUP BY 1), "
        "d3 AS (SELECT s2.doc_id, s2.tok FROM s2 "
        "JOIN comp ON comp.node = s2.doc_id "
        "WHERE comp.component <> comp.node), "
        "kept AS (SELECT s2.doc_id, s2.tok FROM s2 "
        "WHERE s2.doc_id NOT IN (SELECT doc_id FROM d3)), "
        "tot AS (SELECT CAST(sum(tok) AS BIGINT) AS tt FROM t) "
        + part.format(name="exact", src="d1")
        + " UNION ALL " + part.format(name="normalized", src="d2")
        + " UNION ALL " + part.format(name="neardup", src="d3")
        + " UNION ALL " + part.format(name="kept", src="kept")
    )


# --------------------------------------------------------------------------
# X46 — cross-source boilerplate n-gram detection
# --------------------------------------------------------------------------

_X46_HEADER = (
    "content provided under public redistribution terms see original "
    "site notice for details"
)
#: the doc bar is a FRACTION of the corpus (>= max(3, n_docs/200) docs,
#: i.e. 0.5%), not a constant: measured on this fixture, a FIXED bar of
#: 3 docs grows the flagged set 39x across a 10x corpus (closed
#: vocabulary → birthday-effect collisions), which would unbound the
#: broadcast; a fraction bar keeps "boilerplate" meaning "pervasive"
#: at every scale — exactly how production template filters set it.
_X46_MIN_DOCS_FLOOR = 3
_X46_DOC_DIVISOR = 200
_X46_MIN_SOURCES = 2  # AND >= this many distinct sources

_WIN4_SPARK = (
    "CASE WHEN size(w) >= 4 THEN "
    "transform(sequence(0, size(w)-4), i -> concat_ws(' ', "
    "w[i], w[i+1], w[i+2], w[i+3])) "
    "ELSE array() END"
)
_WIN4_DUCK = (
    "CASE WHEN len(w) >= 4 THEN "
    "list_transform(range(1, len(w)-2), i -> "
    "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) "
    "ELSE [] END"
)


def x46_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE boilerplate detection — the template/license-header
    pass of web-scale curation (C4's "boilerplate" filter, Raffel et
    al. 2020; CCNet's cross-document repetition): an n-gram that recurs
    across MANY DOCUMENTS FROM DIFFERENT SOURCES is template text
    (cookie banners, license headers, nav chrome), not content. The
    cross-source requirement is what distinguishes this from x34's
    substring dedup: a passage quoted between two docs of one source is
    duplication; a gram spanning sources is boilerplate. Per source:
    total 4-gram instances, instances matching a flagged gram, distinct
    flagged grams present, and the boilerplate rate in basis points —
    the per-provenance contamination ranking a curation pipeline cuts
    sources by.

    Planted discrimination: every 7th doc gets a same-source twin whose
    text is a fixed 12-word "redistribution notice" header followed by
    the doc's first 8 words — the header's grams span ~all sources and
    must be flagged, while ordinary cross-doc repetition below the
    (>= max(3, 0.5% of docs), >= 2 sources) bar sails through. Twin
    ids derive from max(doc_id)+1 (the x30 lesson: no fixed offsets).

    Scale shape: ONE shuffle keyed on md5(gram) (32-byte keys, never
    gram text) computes per-gram doc/source spread; the doc bar is a
    FRACTION of the corpus, which is what keeps the flagged set (and
    its broadcast) bounded — MEASURED: a fixed 3-doc bar grew the
    flagged set 39x across a 10x step of this closed-vocabulary
    fixture (birthday-effect collisions), while the fraction bar keeps
    "boilerplate" meaning "pervasive" at every size. The flagged set
    broadcasts back against the persisted gram stream map-side; the
    final rollup shuffles |sources| keys. Linear in corpus tokens."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    off = docs.agg((F.max("doc_id") + F.lit(1)).alias("off"))
    twins = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("off")).alias("doc_id"),
            "source",
            F.concat(
                F.lit(_X46_HEADER + " "),
                F.array_join(F.slice(F.expr(_WORDS_SPARK), 1, 8), " "),
            ).alias("text"),
        )
    )
    corpus = docs.unionByName(twins)
    # the gram stream feeds TWO consumers (the per-gram spread stats
    # and the flagged-set probe join) — persist computes the explode +
    # md5 once instead of twice (measured ~35% off the sf0.1 wall)
    grams = scoped_persist(
        corpus.withColumn("w", F.expr(_WORDS_SPARK))
        .select(
            "doc_id", "source", F.explode(F.expr(_WIN4_SPARK)).alias("g")
        )
        .select("doc_id", "source", F.md5("g").alias("h"))
    )
    ndocs = corpus.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        grams.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.countDistinct("source").alias("ns"),
        )
        .crossJoin(F.broadcast(ndocs))
        .filter(
            (
                F.col("nd")
                >= F.expr(
                    f"GREATEST({_X46_MIN_DOCS_FLOOR}, "
                    f"n_docs DIV {_X46_DOC_DIVISOR})"
                )
            )
            & (F.col("ns") >= _X46_MIN_SOURCES)
        )
        .select("h", F.lit(1).alias("is_b"))
    )
    return (
        grams.join(F.broadcast(boiler), "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_b"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
            F.countDistinct(F.when(F.col("is_b") == 1, F.col("h")))
            .cast("bigint")
            .alias("n_boiler_grams"),
        )
        .select(
            "source",
            "n_grams",
            "n_boiler",
            "n_boiler_grams",
            F.expr("(10000 * n_boiler) DIV n_grams")
            .cast("bigint")
            .alias("boiler_bp"),
        )
    )


_X46_SQL = (
    "WITH corpus AS (SELECT doc_id, source, text FROM documents "
    "UNION ALL "
    f"SELECT doc_id + {_X34_OFF_SQL}, source, "
    f"'{_X46_HEADER} ' || "
    f"coalesce(list_aggr(list_slice({_WORDS_DUCK}, 1, 8), "
    "'string_agg', ' '), '') "
    "FROM documents WHERE doc_id % 7 = 0), "
    "g AS (SELECT doc_id, source, md5(win) AS h FROM ("
    "SELECT doc_id, source, unnest({win4}) AS win FROM ("
    f"SELECT doc_id, source, {_WORDS_DUCK} AS w FROM corpus))), "
    "nd AS (SELECT count(*) AS n_docs FROM corpus), "
    "boiler AS (SELECT h FROM g CROSS JOIN nd GROUP BY h, n_docs "
    f"HAVING count(DISTINCT doc_id) >= "
    f"GREATEST({_X46_MIN_DOCS_FLOOR}, n_docs // {_X46_DOC_DIVISOR}) "
    f"AND count(DISTINCT source) >= {_X46_MIN_SOURCES}) "
    "SELECT g.source, CAST(count(*) AS BIGINT) AS n_grams, "
    "CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_boiler, "
    "CAST(count(DISTINCT b.h) AS BIGINT) AS n_boiler_grams, "
    "CAST((10000 * sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)) "
    "// count(*) AS BIGINT) AS boiler_bp "
    "FROM g LEFT JOIN boiler b ON b.h = g.h GROUP BY 1"
).format(win4=_WIN4_DUCK)


# --------------------------------------------------------------------------
# X65 — LSH banding sweep (candidate volume vs recall, measured)
# --------------------------------------------------------------------------

_X65_CONFIGS = (6, 4, 2)  # bands over the SAME 12 hashes (rows = 12/b)


def x65_lsh_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X65 — the LSH TUNING audit: re-band the SAME 12 Carter-Wegman
    min-hashes three ways (6×2, 4×3 = x2's shipped config, 2×6) and
    measure, per configuration, the candidate-pair volume and the
    recall of the planted near-duplicates — the bands×rows trade
    SCALING.md documents as x2's knob, MEASURED instead of asserted
    (P(candidate) = 1−(1−s^r)^b: more bands of shorter keys buys
    recall with candidate volume; fewer, longer bands the reverse —
    this certificate is the data you tune from). Signatures compute
    ONCE (scoped persist); ALL bandings then ride ONE self-equi-join
    keyed (config, band, bkey) — a config column folds the N sweeps
    into a single shuffle instead of N joins + N distincts (measured
    4.8 → ~2 s at sf0.1 over the per-config loop), no re-scan, no
    re-hash, never a cross join. Truth = planted pairs whose BOTH
    sides have signatures (derived from the signature frame itself, so
    shingle-less docs can't deflate recall). Output: 3 rows of exact
    integers."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_rows(_near_dup_corpus(docs))
    sigs = scoped_persist(_signatures(sh))
    truth = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            F.expr(
                "b.doc_id = a.doc_id + 1000000 AND a.doc_id % 10 = 0"
            ),
        )
        .select(
            F.expr("a.doc_id").alias("doc_a"),
            F.expr("b.doc_id").alias("doc_b"),
        )
    )
    n_truth = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_planted")
    )
    # ONE map-side explode builds all 12 (cfg, band, bkey) rows per doc
    # (r14, guide §2.4): the old shape was a 12-branch UNION, each branch
    # re-scanning the persisted signature frame — 12x the scan tasks and
    # a 12-way plan for rows a single projection can emit. Same rows,
    # same values (struct fields computed from the same s{i} columns).
    entries = []
    for b in _X65_CONFIGS:
        r = _N_HASHES // b
        for i in range(b):
            key = "concat_ws(':', " + ", ".join(
                f"CAST(s{i * r + j} AS STRING)" for j in range(r)
            ) + ")"
            entries.append(
                f"struct({b} AS cfg, {i} AS band, {key} AS bkey)"
            )
    bands = sigs.select(
        "doc_id",
        F.explode(F.expr("array(" + ", ".join(entries) + ")")).alias("e"),
    ).select("doc_id", "e.cfg", "e.band", "e.bkey")
    # persist the band rows: the self-join otherwise evaluates the
    # explode TWICE (once per side)
    bands = scoped_persist(bands)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.cfg") == F.col("y.cfg"))
            & (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.cfg").alias("cfg"),
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    cand = scoped_persist(cand)
    n_cand = cand.groupBy("cfg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    n_found = (
        cand.join(F.broadcast(truth), ["doc_a", "doc_b"])
        .groupBy("cfg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
    )
    return (
        n_cand.join(n_found, "cfg", "left")
        .withColumn("n_found", F.coalesce("n_found", F.lit(0)))
        .crossJoin(F.broadcast(n_truth))  # one-row constant frame
        .select(
            F.col("cfg").cast("int").alias("bands"),
            F.expr(f"CAST({_N_HASHES} / cfg AS INT)").alias(
                "rows_per_band"
            ),
            "n_candidates",
            "n_planted",
            F.col("n_found").cast("bigint").alias("n_found"),
            F.expr("(10000 * n_found) DIV n_planted")
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


def _x65_sql() -> str:
    sig_cols = ", ".join(
        f"min((h1 + {s} * h2) % 4294967296) AS s{s}"
        for s in range(_N_HASHES)
    )
    parts = []
    for b in _X65_CONFIGS:
        r = _N_HASHES // b
        band_selects = " UNION ALL ".join(
            f"SELECT doc_id, {i} AS band, "
            + " || ':' || ".join(
                f"CAST(s{i * r + j} AS VARCHAR)" for j in range(r)
            )
            + " AS bkey FROM sigs"
            for i in range(b)
        )
        parts.append(
            f"SELECT CAST({b} AS INT) AS bands, "
            f"CAST({r} AS INT) AS rows_per_band, "
            "(SELECT CAST(count(*) AS BIGINT) FROM ("
            "SELECT DISTINCT x.doc_id, y.doc_id FROM "
            f"({band_selects}) x JOIN ({band_selects}) y "
            "ON x.band = y.band AND x.bkey = y.bkey "
            "AND x.doc_id < y.doc_id)) AS n_candidates, "
            "(SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_planted, "
            "(SELECT CAST(count(*) AS BIGINT) FROM truth t "
            "WHERE EXISTS (SELECT 1 FROM ("
            f"{band_selects}) x JOIN ({band_selects}) y "
            "ON x.band = y.band AND x.bkey = y.bkey "
            "AND x.doc_id = t.doc_a AND y.doc_id = t.doc_b)) AS n_found"
        )
    inner = " UNION ALL ".join(
        f"SELECT * FROM ({p})" for p in parts
    )
    return (
        f"WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}), "
        f"dshingles AS ({_SHINGLE_ROWS_SQL}), "
        "hashed AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS h1, "
        "CAST(('0x' || substr(md5(sh), 9, 8)) AS BIGINT) AS h2 "
        "FROM dshingles), "
        f"sigs AS (SELECT doc_id, {sig_cols} FROM hashed "
        "GROUP BY doc_id), "
        "truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 1000000 "
        "AND a.doc_id % 10 = 0) "
        f"SELECT *, CAST((10000 * n_found) // n_planted AS BIGINT) "
        f"AS recall_bp FROM ({inner})"
    )


# --------------------------------------------------------------------------
# X60 — containment pairs (asymmetric near-dup: doc-in-doc detection)
# --------------------------------------------------------------------------

_X60_SLICE = 50  # blocking key: doc_id < _X60_SLICE plus planted snippets
_X60_SNIP = 15  # planted snippet length (words)
_X60_T = 8000  # containment threshold, basis points


def x60_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X60 — CONTAINMENT dedup pairs: directed ``|A∩B| / |A|`` over
    trigram shingle sets, the asymmetric metric that catches a small
    document living INSIDE a larger one (snippet/quote/digest
    duplication). Symmetric Jaccard — every x2-family detector —
    structurally misses these: a 15-word extract of a 70-word doc has
    containment 1.0 but Jaccard ≈ 0.2, far under any dedup threshold,
    which is why production pipelines run a containment pass (the
    one-sided variant of Lee et al.'s dedup suite) beside MinHash. The
    certificate plants exactly that shape: first-``_X60_SNIP``-words
    snippet twins (fixture device, the x34 pattern) whose containment
    must read 10000 bp while their Jaccard stays in the low thousands.

    Direction is derived, not declared: the smaller shingle set is the
    contained side (ties break to the higher doc_id — deterministic in
    both engines). Like x2c, the pair space generates through the
    shingle EQUI-join on an id-blocked slice (the documented blocking
    key), so even the exact path is never a cross join and candidates
    are bounded by shared-shingle co-occurrence. The PRODUCTION pass is
    :func:`x60b_corpus_containment` — same metric, df-capped shingle
    blocking, whole corpus (VERDICT r8 item 2); this slice variant
    stays as the geometry demonstrator with exhaustive within-block
    pairs."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(
        (F.col("doc_id") % 1000000) < _X60_SLICE
    ).select("doc_id", "text")
    snippets = base.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + F.lit(2000000)).alias("doc_id"),
        F.expr(
            f"concat_ws(' ', slice({_WORDS_SPARK}, 1, {_X60_SNIP}))"
        ).alias("text"),
    )
    corpus = base.unionByName(snippets)
    sh = scoped_persist(_shingle_rows(corpus))
    counts = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "sh")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    return (
        inter.join(
            counts.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
            ),
            "doc_a",
        )
        .join(
            counts.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
            ),
            "doc_b",
        )
        .select(
            F.expr(
                "CASE WHEN na < nb THEN doc_a WHEN nb < na THEN doc_b "
                "ELSE greatest(doc_a, doc_b) END"
            ).cast("bigint").alias("contained_id"),
            F.expr(
                "CASE WHEN na < nb THEN doc_b WHEN nb < na THEN doc_a "
                "ELSE least(doc_a, doc_b) END"
            ).cast("bigint").alias("container_id"),
            F.expr("least(na, nb)").cast("bigint").alias("n_contained"),
            F.expr("greatest(na, nb)").cast("bigint").alias(
                "n_container"
            ),
            "inter",
            F.expr("(10000 * inter) DIV least(na, nb)")
            .cast("bigint")
            .alias("containment_bp"),
            F.expr("(10000 * inter) DIV (na + nb - inter)")
            .cast("bigint")
            .alias("jaccard_bp"),
        )
        .filter(F.col("containment_bp") >= _X60_T)
    )


_X60_SQL = (
    "WITH base AS (SELECT doc_id, text FROM documents "
    f"WHERE doc_id % 1000000 < {_X60_SLICE}), "
    "corpus AS (SELECT doc_id, text FROM base "
    "UNION ALL "
    "SELECT doc_id + 2000000, "
    f"array_to_string(list_slice({_WORDS_DUCK}, 1, {_X60_SNIP}), ' ') "
    "FROM base WHERE doc_id % 10 = 5), "
    f"sh AS ({_SHINGLE_ROWS_SQL}), "
    "counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh "
    "FROM sh GROUP BY 1), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(count(*) AS BIGINT) AS inter FROM sh a JOIN sh b "
    "ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "scored AS (SELECT "
    "CAST(CASE WHEN ca.n_sh < cb.n_sh THEN i.doc_a "
    "WHEN cb.n_sh < ca.n_sh THEN i.doc_b "
    "ELSE greatest(i.doc_a, i.doc_b) END AS BIGINT) AS contained_id, "
    "CAST(CASE WHEN ca.n_sh < cb.n_sh THEN i.doc_b "
    "WHEN cb.n_sh < ca.n_sh THEN i.doc_a "
    "ELSE least(i.doc_a, i.doc_b) END AS BIGINT) AS container_id, "
    "CAST(least(ca.n_sh, cb.n_sh) AS BIGINT) AS n_contained, "
    "CAST(greatest(ca.n_sh, cb.n_sh) AS BIGINT) AS n_container, "
    "i.inter, "
    "CAST((10000 * i.inter) // least(ca.n_sh, cb.n_sh) AS BIGINT) "
    "AS containment_bp, "
    "CAST((10000 * i.inter) // (ca.n_sh + cb.n_sh - i.inter) AS BIGINT) "
    "AS jaccard_bp "
    "FROM inter i "
    "JOIN counts ca ON ca.doc_id = i.doc_a "
    "JOIN counts cb ON cb.doc_id = i.doc_b) "
    f"SELECT * FROM scored WHERE containment_bp >= {_X60_T}"
)


# --------------------------------------------------------------------------
# X60B — corpus-wide containment dedup (df-capped shingle blocking)
# --------------------------------------------------------------------------

_X60B_CAP = 20  # max document frequency for a shingle to block on
_X60B_NMIN = 5  # min pairable-shingle count on the contained side


def x60b_corpus_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X60B — x60's containment metric swept over the WHOLE corpus
    (VERDICT r8 item 2: x60 demonstrates the geometry on an id-blocked
    50-doc slice; this is the production pass). Same directed
    ``|A∩B| / |A|`` certificate — first-15-word snippet twins planted
    across the entire corpus must read 10000 bp containment while
    their Jaccard stays in the low thousands — but the blocking key is
    now the shingle itself under a DOCUMENT-FREQUENCY CAP (the x46
    fraction-bar lesson): only shingles carried by 2..``_X60B_CAP``
    documents generate candidates, so no hot shingle's group ever goes
    quadratic and total pair volume is bounded by Σ df² ≤ CAP·|rows|
    (measured 1.17 M at sf0.1; the cap is the knob that survives a
    Zipfian 100 TB corpus where "of the and" carries everything).
    Both sides of the metric live in the capped shingle space, so a
    true subset pair keeps containment exactly 10000 bp regardless of
    which hot shingles were excluded; ``_X60B_NMIN`` floors the
    contained side's evidence so one lucky rare shingle can't mint a
    pair.

    ONE wide shuffle total, the x57 carrier-fold shape: shingle rows
    fold to ``collect_set(doc_id)`` per shingle (map-side combinable),
    the df cap is a ``size(ids)`` filter on that carrier set, per-doc
    pairable counts re-explode the kept sets, and candidate pairs
    expand INSIDE the sorted carrier array (≤ C(df,2) structs
    map-side) before a pair-keyed count — no shingle-stream self-join,
    no cross join; the two denominator joins carry an O(corpus) count
    frame with NO broadcast hint (AQE broadcasts at fixture scale,
    shuffle-hash-joins at 100 TB where a forced broadcast would OOM).
    Reference anchor: the dedup mandate in the north-star
    extension list (SURVEY.md §2 X1/X2)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")
    snippets = base.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + F.lit(2000000)).alias("doc_id"),
        F.expr(
            f"concat_ws(' ', slice({_WORDS_SPARK}, 1, {_X60_SNIP}))"
        ).alias("text"),
    )
    corpus = base.unionByName(snippets)
    kept = scoped_persist(
        _shingle_rows(corpus)
        .groupBy("sh")
        .agg(F.collect_set("doc_id").alias("ids"))
        .filter(F.expr(f"size(ids) BETWEEN 2 AND {_X60B_CAP}"))
    )
    counts = kept.select(F.explode("ids").alias("doc_id")).groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    inter = (
        kept.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(least(x, y) AS doc_a, "
                    "greatest(x, y) AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    # No F.broadcast hint on the denominator joins: counts is O(corpus)
    # (one row per pairable document) and a FORCED broadcast of a
    # per-document frame OOMs at 100 TB. The inter frame is already
    # pair-aggregated, so AQE picks broadcast at fixture scale and a
    # shuffled hash join at scale (round-10 verdict item 3).
    return (
        inter.join(
            counts.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_sh").alias("na"),
            ),
            "doc_a",
        )
        .join(
            counts.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n_sh").alias("nb"),
            ),
            "doc_b",
        )
        .select(
            F.expr(
                "CASE WHEN na < nb THEN doc_a WHEN nb < na THEN doc_b "
                "ELSE greatest(doc_a, doc_b) END"
            ).cast("bigint").alias("contained_id"),
            F.expr(
                "CASE WHEN na < nb THEN doc_b WHEN nb < na THEN doc_a "
                "ELSE least(doc_a, doc_b) END"
            ).cast("bigint").alias("container_id"),
            F.expr("least(na, nb)").cast("bigint").alias("n_contained"),
            F.expr("greatest(na, nb)").cast("bigint").alias(
                "n_container"
            ),
            "inter",
            F.expr("(10000 * inter) DIV least(na, nb)")
            .cast("bigint")
            .alias("containment_bp"),
            F.expr("(10000 * inter) DIV (na + nb - inter)")
            .cast("bigint")
            .alias("jaccard_bp"),
        )
        .filter(
            (F.col("containment_bp") >= _X60_T)
            & (F.col("n_contained") >= _X60B_NMIN)
        )
    )


_X60B_SQL = (
    "WITH base AS (SELECT doc_id, text FROM documents), "
    "corpus AS (SELECT doc_id, text FROM base "
    "UNION ALL "
    "SELECT doc_id + 2000000, "
    f"array_to_string(list_slice({_WORDS_DUCK}, 1, {_X60_SNIP}), ' ') "
    "FROM base WHERE doc_id % 10 = 5), "
    f"sh AS ({_SHINGLE_ROWS_SQL}), "
    "df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1), "
    "rare AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh) "
    f"WHERE df BETWEEN 2 AND {_X60B_CAP}), "
    "counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh "
    "FROM rare GROUP BY 1), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(count(*) AS BIGINT) AS inter FROM rare a JOIN rare b "
    "ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "scored AS (SELECT "
    "CAST(CASE WHEN ca.n_sh < cb.n_sh THEN i.doc_a "
    "WHEN cb.n_sh < ca.n_sh THEN i.doc_b "
    "ELSE greatest(i.doc_a, i.doc_b) END AS BIGINT) AS contained_id, "
    "CAST(CASE WHEN ca.n_sh < cb.n_sh THEN i.doc_b "
    "WHEN cb.n_sh < ca.n_sh THEN i.doc_a "
    "ELSE least(i.doc_a, i.doc_b) END AS BIGINT) AS container_id, "
    "CAST(least(ca.n_sh, cb.n_sh) AS BIGINT) AS n_contained, "
    "CAST(greatest(ca.n_sh, cb.n_sh) AS BIGINT) AS n_container, "
    "i.inter, "
    "CAST((10000 * i.inter) // least(ca.n_sh, cb.n_sh) AS BIGINT) "
    "AS containment_bp, "
    "CAST((10000 * i.inter) // (ca.n_sh + cb.n_sh - i.inter) AS BIGINT) "
    "AS jaccard_bp "
    "FROM inter i "
    "JOIN counts ca ON ca.doc_id = i.doc_a "
    "JOIN counts cb ON cb.doc_id = i.doc_b) "
    f"SELECT * FROM scored WHERE containment_bp >= {_X60_T} "
    f"AND n_contained >= {_X60B_NMIN}"
)


# --------------------------------------------------------------------------
# X57 — cross-source contamination matrix (pairwise shingle overlap)
# --------------------------------------------------------------------------


def x57_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X57 — the CROSS-SOURCE contamination matrix: for every pair of
    sources, how many distinct word-trigram shingles they share and the
    pairwise Jaccard in basis points. x51 prices dedup WITHIN the
    corpus; this is the provenance-level audit a mixer runs before
    assigning per-source weights (two crawls of the same site look
    independent in doc counts but light up here — double-weighting
    them double-counts the content; and a candidate source overlapping
    the eval-set source is contamination, the source-granular twin of
    x10).

    Exact, never all-pairs on DOCUMENTS: the unit is the distinct
    (source, shingle) pair — per-source vocabularies, sublinear in
    corpus size by Heaps' law. ONE wide shuffle total: shingle rows
    hash to their md5 and ``collect_set(source)`` folds each shingle's
    carrier set in a single map-side-combinable agg (the per-source
    DISTINCT rides inside the set — no separate distinct shuffle, no
    hash self-join; the r8 rewrite of the first-cut distinct+equi-join,
    measured 11.6 s → 3.4 s at sf0.1). Pairs expand INSIDE the sorted
    carrier array (≤ C(|sources|,2) structs per shingle, map-side — a
    shingle in one source, the overwhelming majority, expands to
    nothing), then two tiny aggs (pair counts, per-source vocabulary
    sizes) and a 20-row broadcast close the Jaccard. Output ≤
    C(|sources|,2) rows at any corpus size; never a cross join."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.expr(_WORDS_SPARK).alias("w")
    )
    # Keyed on the RAW trigram, not md5(sh): a word trigram averages
    # ~15-18 bytes while the md5 hex is a fixed 32 — the hash both
    # LENGTHENED the shuffle key and cost a digest per (source,
    # shingle) instance (r13; the md5-key discipline pays off for x34's
    # 8-word windows, not 3-word shingles). Oracle groups identically.
    byh = scoped_persist(
        docs.select(
            "source",
            F.explode(
                F.array_distinct(F.expr(_SHINGLES_SPARK))
            ).alias("sh"),
        )
        .groupBy("sh")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    sizes = byh.select(F.explode("srcs").alias("source")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ng"))
    shared = (
        byh.filter(F.expr("size(srcs) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) -> "
                    "transform(slice(srcs, i + 2, size(srcs)), "
                    "y -> struct(x AS source_a, y AS source_b))))"
                )
            ).alias("p")
        )
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.withColumnRenamed("source", "source_a")),
            "source_a",
        )
        .withColumnRenamed("ng", "ng_a")
        .join(
            F.broadcast(
                sizes.withColumnRenamed("source", "source_b").
                withColumnRenamed("ng", "ng_b")
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "ng_a",
            "ng_b",
            "shared",
            F.expr("(10000 * shared) DIV (ng_a + ng_b - shared)")
            .cast("bigint")
            .alias("jaccard_bp"),
        )
    )


_X57_SQL = (
    "WITH w AS (SELECT source, "
    f"{_WORDS_DUCK} AS w FROM documents), "
    "g AS (SELECT DISTINCT source, sh AS h FROM ("
    f"SELECT source, unnest(list_distinct({_SHINGLES_DUCK})) AS sh "
    "FROM w)), "
    "sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS ng "
    "FROM g GROUP BY 1), "
    "shared AS (SELECT a.source AS source_a, b.source AS source_b, "
    "CAST(count(*) AS BIGINT) AS shared "
    "FROM g a JOIN g b ON a.h = b.h AND a.source < b.source "
    "GROUP BY 1, 2) "
    "SELECT s.source_a, s.source_b, sa.ng AS ng_a, sb.ng AS ng_b, "
    "s.shared, "
    "CAST((10000 * s.shared) // (sa.ng + sb.ng - s.shared) AS BIGINT) "
    "AS jaccard_bp "
    "FROM shared s "
    "JOIN sizes sa ON sa.source = s.source_a "
    "JOIN sizes sb ON sb.source = s.source_b"
)


QUERIES = {
    "x1_exact_dedup": x1_exact_dedup,
    "x2_minhash_near_dup": x2_minhash_near_dup,
    "x30_incremental_neardup": x30_incremental_neardup,
    "x2b_simhash_groups": x2b_simhash_groups,
    "x2c_ngram_jaccard_pairs": x2c_ngram_jaccard_pairs,
    "x2d_dup_clusters": x2d_dup_clusters,
    "x33_canonical_dedup": x33_canonical_dedup,
    "x34_substring_dedup": x34_substring_dedup,
    "x34b_substring_trim": x34b_substring_trim,
    "x40_normalized_dedup": x40_normalized_dedup,
    "x46_boilerplate_grams": x46_boilerplate_grams,
    "x51_dedup_roi": x51_dedup_roi,
    "x57_source_overlap": x57_source_overlap,
    "x60_containment_pairs": x60_containment_pairs,
    "x60b_corpus_containment": x60b_corpus_containment,
    "x65_lsh_sweep": x65_lsh_sweep,
    "x19_line_dedup": x19_line_dedup,
}

ORACLES = {
    "x1_exact_dedup": _X1_SQL,
    "x2_minhash_near_dup": _x2_sql(),
    "x30_incremental_neardup": _x30_sql(),
    "x2b_simhash_groups": _x2b_sql(),
    "x2c_ngram_jaccard_pairs": _X2C_SQL,
    "x2d_dup_clusters": _x2d_sql(),
    "x33_canonical_dedup": _x33_sql(),
    "x34_substring_dedup": _X34_SQL,
    "x34b_substring_trim": _X34B_SQL,
    "x40_normalized_dedup": _X40_SQL,
    "x46_boilerplate_grams": _X46_SQL,
    "x51_dedup_roi": _x51_sql(),
    "x57_source_overlap": _X57_SQL,
    "x60_containment_pairs": _X60_SQL,
    "x60b_corpus_containment": _X60B_SQL,
    "x65_lsh_sweep": _x65_sql(),
    "x19_line_dedup": _X19_SQL,
}
