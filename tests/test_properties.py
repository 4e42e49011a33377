"""Property tests (SURVEY.md §5.6): invariants that hold for any data,
checked on the fixtures — dedup idempotence, top-k stability under
repartitioning, union/row-count conservation.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.dedup import x1_exact_dedup
from acero_delta_lake_streaming_spark.operators.relational import (
    t1_topk,
    u1_union_discriminator,
)


def test_exact_dedup_idempotent(spark, sf_dir):
    """Dedup of a dedup is a no-op: every group in x1's output has one
    distinct text, so re-deduplicating changes nothing."""
    first = x1_exact_dedup(spark, sf_dir)
    assert first.count() == first.select("text_key").distinct().count()
    # applying the same group-keep-min to the kept set is identity
    again = (
        first.groupBy("text_key")
        .agg(F.min("keep_id").alias("keep_id"))
        .count()
    )
    assert again == first.count()


def test_topk_stable_under_repartition(spark, sf_dir):
    """The top-k result must not depend on physical partitioning."""
    base = sorted(map(tuple, t1_topk(spark, sf_dir).collect()))
    for n in (1, 7):
        shuffled = (
            load_table(spark, sf_dir, "orders")
            .repartition(n)
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("o_custkey"))
            .limit(10)
        )
        assert sorted(map(tuple, shuffled.collect())) == base


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """The scale path for a10: approx_percentile (t-digest) must land
    within 2% of the exact interpolated percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 1000)").alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.02, r


def test_union_conserves_rows(spark, sf_dir):
    """Union row count = sum of slice counts (no dedup surprise in
    unionByName)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter("o_orderstatus = 'F'").count()
    b = orders.filter("o_orderstatus = 'O'").count()
    assert u1_union_discriminator(spark, sf_dir).count() == a + b


def test_dedup_output_partition_invariant(spark, sf_dir):
    """Content-hash dedup keeps the same keep_id set regardless of input
    partitioning (min is commutative across partial aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(2000000)).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    results = []
    for n in (2, 13):
        out = (
            corpus.repartition(n)
            .groupBy(F.md5("text").alias("text_key"))
            .agg(F.min("doc_id").alias("keep_id"))
        )
        results.append(sorted(map(tuple, out.collect())))
    assert results[0] == results[1]


def test_sampled_percentiles_sample_rate_and_accuracy(spark, sf_dir):
    """a14's md5-digit sample: rate lands near the designed 2/16, and
    the sampled p50 tracks the exact p50 (deterministic, so a plain
    tolerance works — no seeds, no flakes)."""
    from acero_delta_lake_streaming_spark.operators.relational import (
        a10_percentiles,
        a14_sampled_percentiles,
    )

    total = load_table(spark, sf_dir, "lineitem").count()
    samp = a14_sampled_percentiles(spark, sf_dir)
    n_sample = sum(r.n_sample for r in samp.collect())
    assert 0.08 < n_sample / total < 0.17  # designed rate 0.125
    exact = {r.l_returnflag: r.p50 for r in a10_percentiles(spark, sf_dir).collect()}
    for r in samp.collect():
        assert abs(r.p50_s - exact[r.l_returnflag]) / exact[r.l_returnflag] < 0.10


def test_bloom_prefilter_prunes_without_false_negatives(spark, sf_dir):
    """j4's bloom stage must (a) pass EVERY true-match row — no false
    negatives, the correctness half — and (b) actually prune, i.e. pass
    far fewer rows than the full fact table (at 8192 bits / 3 hashes the
    false-positive rate is small at fixture scale). Both checks are
    deterministic: the bloom positions are md5-derived, no RNG."""
    from acero_delta_lake_streaming_spark.operators.relational import (
        _bloom_build,
        _bloom_passed,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = orders.filter("o_orderpriority = '1-URGENT'").select("o_orderkey")
    passed = _bloom_passed(li, "l_orderkey", _bloom_build(keys, "o_orderkey"))
    n_total = li.count()
    n_passed = passed.count()
    n_true = li.join(keys, li.l_orderkey == keys.o_orderkey, "left_semi").count()
    assert n_passed >= n_true  # no false negatives
    # pruning is real: bloom-passed ≤ true matches + 25% fp headroom,
    # and strictly below the unfiltered fact table
    assert n_passed <= n_true + 0.25 * (n_total - n_true)
    assert n_passed < n_total


def test_file_pvals_round_trip_and_hive_equivalence():
    """The root-agnostic trailing-segment parser (`_file_pvals`) must
    (a) round-trip any quoted hive layout it could meet — including
    values with spaces, '+', '=', unicode — and (b) agree with the
    table-relative parser (`_hive_pvals`) on every path under a table
    root, for any nesting depth. Clone-external absolute paths parse
    identically because only the trailing col=value/ segments are
    read."""
    import os

    from urllib.parse import quote

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from acero_delta_lake_streaming_spark.storage.delta_compat import (
        _file_pvals,
        _hive_pvals,
        _part_base,
    )

    cols = st.lists(
        st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
        min_size=1, max_size=3, unique=True,
    )
    vals = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="/\x00"
        ),
        min_size=1, max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(cols=cols, data=st.data())
    def prop(cols, data):
        pvals = {c: data.draw(vals) for c in cols}
        segs = [f"{c}={quote(v)}" for c, v in pvals.items()]
        rel = os.path.join(*segs, "part-0.parquet")
        for root in ("/tmp/tbl", "/mnt/some dir/clone_src"):
            p = os.path.join(root, rel)
            assert _file_pvals(p) == pvals
            assert _part_base(p) == root
        assert _hive_pvals(os.path.dirname(rel)) == pvals

    prop()
