"""asof_join semantics on hand-built frames: strict vs exact matching,
tie-breaks, left NULLs, and the no-join-node plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.operators.asof import (
    asof_join,
    xj1_asof_prior_click,
)

LEFT = [  # (id, k, t)
    (1, "a", 10),
    (2, "a", 20),
    (3, "a", 30),
    (4, "b", 10),
    (5, "c", 10),  # key with no right rows at all
]
RIGHT = [  # (rid, k, t, v)
    (100, "a", 5, 1.0),
    (101, "a", 20, 2.0),  # exactly at left t=20
    (102, "a", 25, 3.0),
    (103, "b", 9, 4.0),
    (104, "b", 9, 5.0),  # same (k, t) — tiebreak must pick rid=104
]


def _frames(spark):
    left = spark.createDataFrame(LEFT, "id long, k string, t long")
    right = spark.createDataFrame(RIGHT, "rid long, k string, t long, v double")
    return left, right


def test_asof_strict_excludes_equal_timestamps(spark):
    left, right = _frames(spark)
    out = {
        r.id: (r.prior_rid, r.prior_v)
        for r in asof_join(
            left, right, "k", "t", "t",
            {"prior_rid": "rid", "prior_v": "v"},
            allow_exact=False, right_tiebreak="rid",
        ).collect()
    }
    assert out[1] == (100, 1.0)  # t=10: only t=5 precedes
    assert out[2] == (100, 1.0)  # t=20: the t=20 right row is NOT eligible
    assert out[3] == (102, 3.0)  # t=30: latest earlier is t=25
    assert out[4] == (104, 5.0)  # (b,9) tie -> greatest rid
    assert out[5] == (None, None)  # no right rows for key c


def test_asof_exact_includes_equal_timestamps(spark):
    left, right = _frames(spark)
    out = {
        r.id: r.prior_rid
        for r in asof_join(
            left, right, "k", "t", "t",
            {"prior_rid": "rid"},
            allow_exact=True, right_tiebreak="rid",
        ).collect()
    }
    assert out[2] == 101  # t=20 right row now matches its own timestamp


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "t", "t", {"prior_rid": "rid"},
        right_tiebreak="rid",
    )
    assert out.count() == len(LEFT)
    assert [c for c in out.columns] == ["id", "k", "t", "prior_rid"]


def test_asof_plan_has_no_join_node(spark, sf_dir):
    """The whole point: union + one windowed sort per key — no join
    operator, no cartesian, one exchange on the key."""
    plan = (
        xj1_asof_prior_click(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as an equi-join on
    (user, cell) — the naive range condition's nested-loop plan is the
    100 TB trap this operator exists to avoid."""
    from acero_delta_lake_streaming_spark.operators.asof import (
        xj2_range_clicks_before_purchase,
    )

    plan = (
        xj2_range_clicks_before_purchase(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_matches_pandas_merge_asof(spark):
    """Property test: the union+window formulation must agree with
    pandas.merge_asof (the trusted single-node reference) on random
    inputs, for both strict and at-or-before matching. Right-side ties
    on (key, t) resolve to the greatest rid on both sides (merge_asof
    keeps the last row in sort order; we sort by (t, rid))."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.sampled_from(["a", "b", "c"])
    times = st.integers(min_value=0, max_value=50)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        left_rows=st.lists(st.tuples(keys, times), min_size=1, max_size=8),
        right_rows=st.lists(
            st.tuples(keys, times, st.floats(0, 9, allow_nan=False)),
            max_size=8,
        ),
        allow_exact=st.booleans(),
    )
    def check(left_rows, right_rows, allow_exact):
        left = [(i, k, t) for i, (k, t) in enumerate(left_rows)]
        right = [(100 + i, k, t, v) for i, (k, t, v) in enumerate(right_rows)]
        ldf = spark.createDataFrame(left, "id long, k string, t long")
        rdf = spark.createDataFrame(
            right, "rid long, k string, t long, v double"
        )
        got = {
            r.id: (r.rid, r.v)
            for r in asof_join(
                ldf, rdf, "k", "t", "t",
                {"rid": "rid", "v": "v"},
                allow_exact=allow_exact, right_tiebreak="rid",
            ).collect()
        }

        lp = pd.DataFrame(left, columns=["id", "k", "t"]).sort_values(
            "t", kind="mergesort"
        )
        rp = (
            pd.DataFrame(right, columns=["rid", "k", "t", "v"])
            .astype({"rid": "int64", "t": "int64", "v": "float64"})
            .sort_values(["t", "rid"], kind="mergesort")
        )
        exp_df = pd.merge_asof(
            lp, rp, on="t", by="k",
            allow_exact_matches=allow_exact, direction="backward",
        )
        exp = {
            int(r.id): (
                None if pd.isna(r.rid) else int(r.rid),
                None if pd.isna(r.v) else r.v,
            )
            for r in exp_df.itertuples()
        }
        assert got == exp

    check()
