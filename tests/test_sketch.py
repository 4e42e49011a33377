"""Behavioral invariants for the sketch/profile/SCD2/pivot operators —
properties the hash-parity gate can't express (error bounds, interval
algebra, marginal consistency)."""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.relational import a11_pivot
from acero_delta_lake_streaming_spark.operators.sketch import (
    _K,
    dq1_column_profile,
    x13_kmv_distinct,
)
from acero_delta_lake_streaming_spark.operators.windows import (
    w7_scd2_user_state,
)


def test_kmv_error_bound(spark, sf_dir):
    """KMV with k=64 has relative std error ~1/sqrt(k-2) ≈ 12.7%; assert
    every group lands within 4 sigma (and exactly when under-full: with
    fewer than k distinct hashes the sketch IS the exact distinct)."""
    rows = x13_kmv_distinct(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        if r.exact_users < _K:
            # under-full sketch: estimate must equal the number of
            # distinct hashes, which can differ from exact_users only
            # by hash collisions (none at fixture scale)
            assert r.est_users == r.exact_users, r
        else:
            rel = abs(r.est_users - r.exact_users) / r.exact_users
            assert rel < 0.51, f"{r}: rel err {rel:.2f}"


def test_dq1b_estimates_track_exact(spark, sf_dir):
    """dq1b's KMV distinct estimates must agree with dq1's exact
    profile: exactly when under-full (< k distinct), within 4-sigma KMV
    error otherwise; n_rows/n_null/min/max are identical by
    construction."""
    from acero_delta_lake_streaming_spark.operators.sketch import (
        dq1b_approx_profile,
    )

    exact = {r.col_name: r for r in dq1_column_profile(spark, sf_dir).collect()}
    approx = {
        r.col_name: r for r in dq1b_approx_profile(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for name, a in approx.items():
        e = exact[name]
        assert (a.n_rows, a.n_null, a.min_val, a.max_val) == (
            e.n_rows, e.n_null, e.min_val, e.max_val
        ), name
        if e.n_distinct < _K:
            assert a.est_distinct == e.n_distinct, name
        else:
            rel = abs(a.est_distinct - e.n_distinct) / e.n_distinct
            assert rel < 0.51, f"{name}: rel err {rel:.2f}"


def test_planes_for_occupancy_matches_in_plan_derivation(spark):
    """The driver-side sizing helper and x14's in-plan _PPT_SPARK must
    agree for any corpus count (same integer derivation)."""
    import pyspark.sql.functions as F

    from acero_delta_lake_streaming_spark.operators.similarity import (
        _PPT_SPARK,
        planes_for_occupancy,
    )

    counts = [1, 15, 16, 17, 255, 256, 257, 5500, 55000, 10**6]
    rows = (
        spark.createDataFrame([(c,) for c in counts], "cnt long")
        .select("cnt", F.expr(_PPT_SPARK).alias("ppt"))
        .collect()
    )
    for r in rows:
        assert r.ppt == planes_for_occupancy(r.cnt), (r.cnt, r.ppt)


def test_profile_marginals(spark, sf_dir):
    prof = {r.col_name: r for r in dq1_column_profile(spark, sf_dir).collect()}
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert set(prof) == {
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
        "o_orderdate",
    }
    for r in prof.values():
        assert r.n_rows == n_orders
        assert r.n_null == 0
        assert 0 < r.n_distinct <= n_orders
        assert r.min_val <= r.max_val
    assert prof["o_orderstatus"].n_distinct <= 3


def test_pivot_marginals(spark, sf_dir):
    piv = a11_pivot(spark, sf_dir).collect()
    total = sum(r.n_f + r.n_o + r.n_p for r in piv)
    assert total == load_table(spark, sf_dir, "orders").count()


def test_scd2_interval_algebra(spark, sf_dir):
    """Per user: intervals are contiguous (each to_ms equals the next
    from_ms), non-overlapping, adjacent states differ, and exactly one
    open-ended current row exists."""
    rows = w7_scd2_user_state(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r.from_ms)
        currents = [r for r in ivs if r.is_current == 1]
        assert len(currents) == 1, f"user {uid}: {len(currents)} current rows"
        assert ivs[-1].is_current == 1 and ivs[-1].to_ms is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.to_ms == b.from_ms, f"user {uid}: gap {a} -> {b}"
            assert a.state != b.state, f"user {uid}: unmerged run {a} -> {b}"
            assert a.is_current == 0


def test_scd2_event_conservation(spark, sf_dir):
    """Sum of per-interval n_events equals the sliced event count —
    the history build loses or invents nothing."""
    rows = w7_scd2_user_state(spark, sf_dir).collect()
    n_sliced = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") % 97) == 0)
        .count()
    )
    assert sum(r.n_events for r in rows) == n_sliced


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """x27's HLL estimate must land within ~3 standard errors of the
    exact distinct count (σ ≈ 1.04/√256 ≈ 6.5%); deterministic — the
    registers are md5-derived, no RNG."""
    from acero_delta_lake_streaming_spark.operators.sketch import (
        x27_hll_distinct,
    )

    row = x27_hll_distinct(spark, sf_dir).collect()[0]
    exact = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert abs(row["est_distinct"] - exact) / exact < 0.20
    assert row["n_registers"] + row["zero_registers"] == 256
