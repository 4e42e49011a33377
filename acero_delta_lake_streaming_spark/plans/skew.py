"""Skew-resistant aggregation: the salting pattern as a reusable plan.

AQE's skew-join splitting handles joins, but a single hot GROUP BY key
still funnels every row of that key through one reduce task. The classic
fix is two-stage salted aggregation: shard each key across ``salt``
partial groups, aggregate the shards (map-side combine already shrinks
them), then merge the shards per key. Results are identical for any
commutative+associative aggregate; the first shuffle spreads the hot key
over ``salt`` tasks.

This matters when one entity dominates the data — one viral document,
one bot user, one null-ish default key — which at 100 TB is the rule,
not the exception. Counts/sums here; the same shape extends to any
mergeable aggregate (min/max, HLL sketches, decimal sums).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage salted groupBy.

    ``aggs`` maps output column -> (merge_fn_name, partial_expr), e.g.::

        salted_agg(df, ["k"], {
            "n": ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("v")),
            "mx": ("max", F.max("v")),
        })

    is value-identical to ``df.groupBy("k").agg(count(1), sum(v),
    max(v))`` but shards each key over ``salt`` partial groups first.
    The merge function must combine partials of the aggregate (sum for
    counts/sums, max for max, ...)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{out}") for out, (_m, expr) in aggs.items()]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            getattr(F, merge)(f"__p_{out}").alias(out)
            for out, (merge, _e) in aggs.items()
        ]
    )
    return merged


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: DataFrame,
) -> DataFrame:
    """Skew-split inner equi-join for a known hot-key set.

    AQE's skew splitting only helps sort-merge joins whose skew is
    visible in shuffle statistics at runtime; when the hot keys are
    known up front (a bot user, a null-ish default, a viral document),
    splitting the plan explicitly is cheaper and deterministic:

    * hot rows  — left semi-filtered to ``hot_keys``, joined with the
      (small by construction: |hot keys| distinct values) hot slice of
      ``right`` via BROADCAST — the hot key never shuffles at all;
    * cold rows — anti-filtered, joined normally (shuffle without the
      hot key is well-balanced by assumption).

    Result is value-identical to ``left.join(right, key)`` for any
    ``hot_keys`` set. ``hot_keys`` must be a 1-column DataFrame named
    ``key``, small enough to broadcast (it also broadcasts into both
    semi/anti filters)."""
    hk = F.broadcast(hot_keys.select(key).distinct())
    l_hot = left.join(hk, key, "left_semi")
    l_cold = left.join(hk, key, "left_anti")
    r_hot = right.join(hk, key, "left_semi")
    out_hot = l_hot.join(F.broadcast(r_hot), key)
    out_cold = l_cold.join(right, key)
    return out_hot.unionByName(out_cold)
