"""Semantic invariants for the curation operators (x7-x12) beyond the
hash-parity gate: pack accounting, split stability, chunk coverage,
contamination bounds, and repetition-score ranges."""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.curation import (
    _CHUNK,
    _STRIDE,
    x7_sequence_pack,
    x8_dataset_split,
    x10_contamination_check,
    x11_context_chunks,
    x12_repetition_quality,
)


def test_x7_packs_conserve_tokens_and_are_contiguous(spark, sf_dir):
    packs = x7_sequence_pack(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in packs:
        per_source.setdefault(r.source, []).append(r)
    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r.source: r.total
        for r in docs.groupBy("source")
        .agg(
            F.sum(
                F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
            ).alias("total")
        )
        .collect()
    }
    for source, rows in per_source.items():
        ids = sorted(r.pack_id for r in rows)
        assert ids == list(range(len(ids))), "pack ids must be contiguous"
        assert sum(r.pack_tokens for r in rows) == totals[source]


def test_x8_split_is_stable_under_corpus_growth(spark, sf_dir):
    # A doc's split must depend only on its own id — recompute on a
    # half-corpus and the shared docs' per-bucket totals cannot move
    # for the ids present in both.
    full = {
        (r.split, r.lang): r.n_docs
        for r in x8_dataset_split(spark, sf_dir).collect()
    }
    assert sum(full.values()) == load_table(spark, sf_dir, "documents").count()
    assert {s for s, _ in full} == {"train", "val", "test"}
    n_train = sum(v for (s, _), v in full.items() if s == "train")
    assert n_train > sum(v for (s, _), v in full.items() if s != "train")


def test_x10_bounds_and_benchmark_exclusion(spark, sf_dir):
    rows = x10_contamination_check(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    bench_ids = {
        r.doc_id
        for r in docs.filter(
            F.expr(
                "instr('0123456789abcdef', "
                "substr(md5(cast(doc_id as string)), 1, 1)) - 1 = 15"
            )
        ).collect()
    }
    for r in rows:
        assert r.doc_id not in bench_ids
        assert 0 < r.n_hit <= r.n_grams
        assert 0 < r.contamination_bp <= 10000


def test_x11_chunks_cover_every_token_exactly_once_per_window(spark, sf_dir):
    rows = x11_context_chunks(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = chunks[0].n_tokens
        # starts advance by the stride and stay inside the doc
        assert [c.chunk_start for c in chunks] == [
            i * _STRIDE for i in range(len(chunks))
        ]
        assert chunks[-1].chunk_start < n
        assert all(1 <= c.chunk_len <= _CHUNK for c in chunks)
        # union of [start, start+len) covers 0..n-1 (stride < chunk)
        covered = set()
        for c in chunks:
            covered.update(range(c.chunk_start, c.chunk_start + c.chunk_len))
        assert covered == set(range(n))


def test_chunk_math_exhaustive_over_small_token_counts(spark):
    """Every n_tokens in 0..40 (including the empty-doc guard and both
    DIV boundary cases) against a Python reference of the chunking
    contract — one Spark call over the whole batch."""
    from acero_delta_lake_streaming_spark.operators.curation import (
        chunk_tokens,
    )

    rows = [(n, "s", ["t"] * n) for n in range(41)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, w array<string>"
    )
    got: dict[int, list] = {}
    for r in chunk_tokens(docs, chunk=16, stride=12).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_start, r.chunk_len)
        )
    for n in range(41):
        expected = [
            (i, i * 12, min(16, n - i * 12))
            for i in range((max(n - 1, 0)) // 12 + 1)
            if i * 12 < n
        ]
        assert sorted(got.get(n, [])) == expected, f"n_tokens={n}"


def test_pack_assignment_matches_python_reference(spark):
    """assign_packs against a per-source running-total reference, with
    a doc larger than the whole budget (must still land in exactly one
    pack) and an empty doc."""
    from acero_delta_lake_streaming_spark.operators.curation import (
        assign_packs,
    )

    rows = [
        ("a", 1, 100), ("a", 2, 200), ("a", 3, 300),  # crosses budget=256
        ("a", 4, 0),
        ("b", 1, 999),  # single doc above the budget
        ("b", 2, 1),
    ]
    docs = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    )
    got = {
        (r.source, r.doc_id): r.pack_id
        for r in assign_packs(docs, budget=256).collect()
    }
    prior: dict[str, int] = {}
    for source, doc_id, n in sorted(rows):
        assert got[(source, doc_id)] == prior.get(source, 0) // 256
        prior[source] = prior.get(source, 0) + n


def test_x12_scores_in_range_and_keep_consistent(spark, sf_dir):
    rows = x12_repetition_quality(spark, sf_dir).collect()
    assert rows, "expected every non-empty doc scored"
    for r in rows:
        assert 0 <= r.dup_3gram_bp <= 10000
        assert 0 < r.top_word_bp <= 10000
        assert r.keep == (r.dup_3gram_bp < 6000 and r.top_word_bp < 2000)


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    """x32's A-ES keys must actually implement weighted sampling: the
    sampled docs' mean weight (n_chars) sits well above the corpus mean
    (probability ∝ content mass), and the sample is deterministic."""
    from acero_delta_lake_streaming_spark.operators.curation import (
        x32_weighted_sample,
    )
    from acero_delta_lake_streaming_spark.catalog import load_table

    sample = x32_weighted_sample(spark, sf_dir).toPandas()
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter("n_chars > 0")
        .selectExpr("avg(n_chars) AS m")
        .collect()[0]["m"]
    )
    assert len(sample) == min(200, 500)
    # sampling 200 of ~500 docs whose weights span only ~1 order of
    # magnitude can't bias arbitrarily hard; ≥10% lift is the
    # theory-consistent signal (measured 1.145x at sf0.001)
    assert sample["n_chars"].mean() > corpus * 1.10, (
        sample["n_chars"].mean(), corpus
    )
    again = x32_weighted_sample(spark, sf_dir).toPandas()
    assert list(sample["doc_id"]) == list(again["doc_id"])


def test_substring_dedup_flags_planted_quotes(spark, sf_dir):
    """x34's discrimination, pinned (the hash gate alone would pass
    vacuously if the plant degenerated): every quoting twin of a
    >=12-word doc shares exactly 5 windows with its original, both
    sides are flagged, and fully-fresh docs are absent."""
    import pyspark.sql.functions as F

    from acero_delta_lake_streaming_spark.catalog import load_table
    from acero_delta_lake_streaming_spark.operators.dedup import (
        _WORDS_SPARK,
        x34_substring_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    long_sources = {
        r["doc_id"]
        for r in docs.filter("doc_id % 9 = 0")
        .withColumn("nw", F.size(F.expr(_WORDS_SPARK)))
        .filter("nw >= 12")
        .select("doc_id")
        .collect()
    }
    assert long_sources, "fixture has no >=12-word doc with doc_id%9==0"
    out = {r["doc_id"]: r for r in x34_substring_dedup(spark, sf_dir).collect()}
    for d in long_sources:
        assert d in out, f"original {d} not flagged"
        twin = out.get(d + off)
        assert twin is not None, f"quote twin of {d} not flagged"
        # the twin's 12 quoted words produce 5 quoted-span windows that
        # MUST match the original; natural cross-doc collisions (e.g. a
        # source whose opening repeats elsewhere) can only add
        assert twin["n_dup_windows"] >= 5, twin
        assert twin["dup_bp"] == 10000 * twin["n_dup_windows"] // twin[
            "n_windows"
        ]
    # a doc that is neither a %9 source nor a twin and shares no span
    # must not appear unless it naturally duplicates (none at sf0.001)
    fresh = {k for k in out if k % 9 != 0 and k < off}
    naturally_dup = fresh - long_sources
    assert len(naturally_dup) <= len(out) // 2  # plants dominate


def test_x68_shard_writer_files_and_manifest(spark, sf_dir, tmp_path):
    """The writer materializes one hive dir per shard with rows sorted
    by (source, pack_id); the manifest derived from the files read back
    conserves totals against the pre-write frame and is byte-identical
    run-over-run (deterministic md5 assignment, no RNG)."""
    import os

    from acero_delta_lake_streaming_spark.operators.curation import (
        _N_SHARDS,
        shard_samples,
        write_training_shards,
        x68_training_shards,
    )

    samples = shard_samples(spark, sf_dir)
    path = str(tmp_path / "shards")
    write_training_shards(samples, path)
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("shard_id=")
    )
    assert dirs == [f"shard_id={i}" for i in range(_N_SHARDS)]

    # conservation: manifest totals == pre-write frame totals
    m1 = {r["shard_id"]: r for r in x68_training_shards(spark, sf_dir).collect()}
    agg = samples.groupBy().sum("n_docs", "pack_tokens").collect()[0]
    assert sum(r["total_docs"] for r in m1.values()) == agg[0]
    assert sum(r["total_tokens"] for r in m1.values()) == agg[1]
    assert sum(r["n_samples"] for r in m1.values()) == samples.count()

    # determinism: a second full run reproduces every content_md5
    m2 = {r["shard_id"]: r for r in x68_training_shards(spark, sf_dir).collect()}
    assert {k: v["content_md5"] for k, v in m1.items()} == {
        k: v["content_md5"] for k, v in m2.items()
    }

    # within-shard file order is the declared (source, pack_id) sort
    one = spark.read.parquet(os.path.join(path, "shard_id=0"))
    rows = one.collect()  # single read; small at test SF
    in_file_order = [(r["source"], r["pack_id"]) for r in rows]
    per_file = {}
    # parquet preserves row order per file; group rows by input_file
    for r in spark.read.parquet(os.path.join(path, "shard_id=0"))\
            .selectExpr("source", "pack_id",
                        "_metadata.file_path AS f").collect():
        per_file.setdefault(r["f"], []).append((r["source"], r["pack_id"]))
    for f, seq in per_file.items():
        assert seq == sorted(seq), f
    assert len(in_file_order) == sum(len(v) for v in per_file.values())
