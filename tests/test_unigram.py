"""x73 unigram-LM trainer vs a from-scratch Python replay.

The DuckDB oracle replays the same SQL-shaped DP, so it cannot catch a
formula bug both sides share; this replay can: an independent Python
implementation of the seed → hard-EM → Viterbi pipeline (including the
portable-ln quantization, ported op-for-op so the e9 floors are
bit-identical) must reproduce the exact certificate.
"""

from __future__ import annotations

import collections

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.text import (
    _X73_BIG,
    _X73_M,
    _X73_SEED_K,
    x73_unigram_train,
)
from acero_delta_lake_streaming_spark.plans.cache import release_scoped

_WORDS = "filter(split(text, ' '), x -> x != '')"


def _portable_ln_py(x: float) -> float:
    """Python port of retrieval._portable_ln — the identical IEEE op
    sequence (Python floats ARE IEEE doubles), so floor(1e9·ln) matches
    the engines bit-for-bit. math.log would NOT: its 1-ulp freedom
    flips e9 floors near integer boundaries."""
    sqrt2 = 1.4142135623730951
    ln2 = 0.6931471805599453
    k0 = int(x).bit_length() - 1
    m0 = x / float(1 << k0)
    lnk = k0 + (1 if m0 > sqrt2 else 0)
    lm = m0 * 0.5 if m0 > sqrt2 else m0
    lz = (lm - 1.0) / (lm + 1.0)
    ls = lz * lz
    poly = 0.047619047619047616
    for c in (0.05263157894736842, 0.058823529411764705,
              0.06666666666666667, 0.07692307692307693,
              0.09090909090909091, 0.1111111111111111,
              0.14285714285714285, 0.2, 0.3333333333333333, 1.0):
        poly = c + ls * poly
    return float(lnk) * ln2 + 2.0 * lz * poly


def _lnq(n: int) -> int:
    import math

    return math.floor(_portable_ln_py(float(n)) * 1e9)


def _costs(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {p: _lnq(total) - _lnq(c) for p, c in counts.items()}


def _viterbi(w: str, cost: dict[str, int]) -> tuple[list[str], int]:
    best = [0] + [None] * len(w)
    back = [0] * (len(w) + 1)
    for p in range(1, len(w) + 1):
        cands = [
            (best[j - 1] + cost.get(w[j - 1:p], _X73_BIG), j)
            for j in range(max(1, p - _X73_M + 1), p + 1)
        ]
        mn = min(c for c, _ in cands)
        back[p] = min(j for c, j in cands if c == mn)
        best[p] = mn
    ps, cur = [], len(w)
    while cur > 0:
        j = back[cur]
        ps.append(w[j - 1:cur])
        cur = j - 1
    return ps, best[len(w)]


def test_x73_matches_python_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wts = {
        r["word"]: r["cnt"]
        for r in docs.select(F.explode(F.expr(_WORDS)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # seed: all chars + top-K multi-char substrings (overlap-counted)
    sub = collections.Counter()
    for w, wt in wts.items():
        for j in range(len(w)):
            for ln in range(1, _X73_M + 1):
                if j + ln <= len(w):
                    sub[w[j:j + ln]] += wt
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = dict(
        sorted(
            ((p, c) for p, c in sub.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:_X73_SEED_K]
    )
    model0 = _costs({**chars, **multi})
    # round 1
    counts1 = collections.Counter()
    for w, wt in wts.items():
        for p in _viterbi(w, model0)[0]:
            counts1[p] += wt
    vocab2 = dict(counts1)
    for ch in chars:
        vocab2.setdefault(ch, 1)
    model1 = _costs(vocab2)
    # round 2
    counts2: collections.Counter = collections.Counter()
    nll = 0
    n_inst = 0
    for w, wt in wts.items():
        ps, pc = _viterbi(w, model1)
        for p in ps:
            counts2[p] += wt
        nll += wt * pc
        n_inst += wt
    expected = {
        p: (len(p), c, model1[p]) for p, c in counts2.items()
    }
    expected["__nll__"] = (0, n_inst, nll)

    try:
        rows = x73_unigram_train(spark, sf_dir).collect()
    finally:
        release_scoped()
    got = {r["piece"]: (r["n_chars"], r["cnt"], r["cost_e9"]) for r in rows}
    assert got == expected
