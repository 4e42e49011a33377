"""Candidate-volume growth + recall across fixture scales (VERDICT r2 #8).

The LSH designs (x2 banded MinHash, x3b multi-table sign-LSH) claim O(N)
candidate volume with fixed banding/plane constants — the property that
makes them the 100 TB path. documents/embeddings only actually grow
between sf0.01 and sf0.1 (×10 / ×4; sf0.001 and sf0.01 ship identical
corpora — TESTDATA.md), so that is the measured step. Pinned here:

* recall stays above its floor at BOTH scales (not just the small
  fixture the r2 tests used), and
* |candidates| grows at most linearly in corpus size (×1.5 slack).

Measured (2026-08): x2 candidates 81→816 for corpus 550→5500 (×10.07 vs
×10), planted-pair recall 0.98/0.95; ANN candidates 1025→4222 for corpus
500→2000 (×4.12 vs ×4), recall@5 0.68/0.72.
"""

from __future__ import annotations

import collections

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.dedup import (
    _near_dup_corpus,
    _shingle_rows,
    _signatures_and_candidates,
    x2_minhash_near_dup,
)
from acero_delta_lake_streaming_spark.operators.similarity import (
    _lsh_candidate_ids,
    _semdedup_corpus,
    _semdedup_pair_ids,
    x3_cosine_topk,
    x3b_ann_lsh,
    x14_semdedup,
)
from acero_delta_lake_streaming_spark.plans.cache import release_scoped

SMALL = "/root/testdata/sf0.01"
LARGE = "/root/testdata/sf0.1"
GROWTH_SLACK = 1.5


def test_minhash_recall_and_linear_candidates(spark):
    stats = {}
    for sf in (SMALL, LARGE):
        docs = load_table(spark, sf, "documents")
        corpus_n = _near_dup_corpus(docs).count()
        _, cand = _signatures_and_candidates(
            _shingle_rows(_near_dup_corpus(docs))
        )
        cand_n = cand.count()
        planted = [
            r.doc_id
            for r in docs.filter("doc_id % 10 = 0").select("doc_id").collect()
        ]
        found = {
            (r.doc_a, r.doc_b)
            for r in x2_minhash_near_dup(spark, sf).collect()
        }
        release_scoped()
        recall = sum((d, d + 1000000) in found for d in planted) / len(planted)
        assert recall >= 0.9, (sf, recall)
        stats[sf] = (corpus_n, cand_n)
    (n1, c1), (n2, c2) = stats[SMALL], stats[LARGE]
    assert n2 > n1, "fixture corpora no longer differ — update SMALL/LARGE"
    assert c2 / c1 <= (n2 / n1) * GROWTH_SLACK, stats


def test_semdedup_recall_and_linear_candidates(spark):
    """x14's adaptive plane count must hold candidate volume ~linear in
    the corpus (fixed planes made it ~quadratic: E[bucket] = N/8 per
    table), while keeping recall 1.0 on the planted scaled duplicates
    (sign-LSH buckets are scale-invariant at any plane count)."""
    stats = {}
    for sf in (SMALL, LARGE):
        emb = load_table(spark, sf, "embeddings")
        corpus = _semdedup_corpus(emb)
        n = corpus.count()
        cand_n = _semdedup_pair_ids(spark, corpus).count()
        planted = [
            r.vec_id
            for r in emb.filter("vec_id % 10 = 0").select("vec_id").collect()
        ]
        dropped = {
            r.dropped_id: r.kept_id
            for r in x14_semdedup(spark, sf).collect()
        }
        recall = sum(d + 1000000 in dropped for d in planted) / len(planted)
        assert recall == 1.0, (sf, recall)
        stats[sf] = (n, cand_n)
    (n1, c1), (n2, c2) = stats[SMALL], stats[LARGE]
    assert n2 > n1, "fixture corpora no longer differ — update SMALL/LARGE"
    assert c2 / c1 <= (n2 / n1) * GROWTH_SLACK, stats


def test_ann_recall_and_linear_candidates(spark):
    stats = {}
    for sf in (SMALL, LARGE):
        emb = load_table(spark, sf, "embeddings")
        n = emb.count()
        cand_n = _lsh_candidate_ids(spark, emb).count()
        by_q = collections.defaultdict(list)
        for r in x3_cosine_topk(spark, sf).collect():
            by_q[r.query_id].append((r.cosine, r.vec_id))
        exact = {
            q: [v for _, v in sorted(lst, key=lambda t: (-t[0], t[1]))[:5]]
            for q, lst in by_q.items()
        }
        ann = collections.defaultdict(set)
        for r in x3b_ann_lsh(spark, sf).collect():
            ann[r.query_id].add(r.vec_id)
        recalls = [
            len(set(top5) & ann[q]) / len(top5) for q, top5 in exact.items()
        ]
        assert sum(recalls) / len(recalls) >= 0.5, (sf, recalls)
        stats[sf] = (n, cand_n)
    (n1, c1), (n2, c2) = stats[SMALL], stats[LARGE]
    assert n2 > n1, "fixture corpora no longer differ — update SMALL/LARGE"
    assert c2 / c1 <= (n2 / n1) * GROWTH_SLACK, stats


def test_incremental_probe_volume_corpus_invariant(spark):
    """x30's scale claim, pinned: a FIXED delta batch probing a 1x vs 4x
    corpus must produce (near-)identical candidate volume — MinHash band
    keys collide on similarity, not capacity, and the replica corpus is
    letter-rotated so its shingles are disjoint from the delta's. The
    decade version of this measurement (x8.2 corpus, probe EXACTLY
    flat at 596) lives in scale_probe.py / SCALING.md; this pins the
    x4 step in the gate."""
    import pyspark.sql.functions as F

    from acero_delta_lake_streaming_spark.operators.dedup import (
        _band_rows,
        _incremental_corpus,
    )

    docs = load_table(spark, SMALL, "documents")
    corpus_all, off_df = _incremental_corpus(docs)
    off = off_df.collect()[0]["off"]  # delta ids live in [off, 3*off)
    assert 3 * off <= 10_000_000  # replicas offset by 10M below
    delta = corpus_all.filter(
        (F.col("doc_id") >= off) & (F.col("doc_id") < 3 * off)
    )
    rot = "etaoinshrd"
    counts = {}
    for times in (1, 4):
        parts = []
        for i in range(times):
            r = rot[i:] + rot[:i]
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.translate("text", rot, r).alias("text"),
                )
            )
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        corpus = base.unionByName(delta)
        sh = _shingle_rows(corpus)
        sigs, _ = _signatures_and_candidates(sh)
        bands = _band_rows(sigs)
        bands_new = bands.filter(
            (F.col("doc_id") >= off) & (F.col("doc_id") < 3 * off)
        )
        a, b = bands.alias("a"), bands_new.alias("b")
        counts[times] = (
            a.join(
                F.broadcast(b),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
    # disjoint replicas must not add probe candidates (±10% slack for
    # incidental collisions on short rotated words)
    assert counts[4] <= counts[1] * 1.1, counts
    assert counts[1] > 0
