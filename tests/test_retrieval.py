"""Semantics + scale-shape tests for the retrieval/linkage family and
the round-4 time-series additions (w9 gap fill, w10 EMA).

The oracle-parity gate proves value equality; these pin the *claims*
the operators make about behavior and scale:

* x21: every hit contains a query term; scores are BM25-monotone in a
  controlled corpus (more matched terms => higher score when tf/dl are
  held equal); the candidate set grows linearly with the corpus, never
  superlinearly (the inverted-index-probe property).
* x23: the pair space is |vocab|²-bounded — CONSTANT between sf0.01 and
  sf0.1 because the name vocabulary is fixed while supports grow (the
  distinct-first property that makes edit-distance linkage viable at
  100 TB).
* w9: the output calendar is gap-free per type, and at least one gap
  row was actually forward-filled at the test SF (the fill path is
  exercised, not vacuous).
* w10: the integer recurrence matches an independent Python fold.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.operators.retrieval import (
    _QUERY_TERMS,
    x21_bm25_topk,
    x23_fuzzy_linkage,
)
from acero_delta_lake_streaming_spark.operators.windows import (
    w9_gap_fill,
    w10_ema,
)
from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.plans.cache import release_scoped

SMALL = "/root/testdata/sf0.01"
LARGE = "/root/testdata/sf0.1"
GROWTH_SLACK = 1.5


def test_bm25_hits_contain_query_terms(spark, sf_dir):
    top = x21_bm25_topk(spark, sf_dir).collect()
    release_scoped()
    assert 0 < len(top) <= 25
    # scores are positive, sorted desc with doc_id tie-break
    scores = [(r.score_ppm, r.doc_id) for r in top]
    assert all(s > 0 for s, _ in scores)
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    ids = [r.doc_id for r in top]
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
        .collect()
    )
    for r in docs:
        assert any(t in r.text.split(" ") for t in _QUERY_TERMS), r.doc_id


def test_bm25_candidates_grow_linearly(spark):
    """The probe plan touches only docs containing a query term; that
    candidate count must track corpus size (×10 step), not blow up."""
    counts = {}
    for sf in (SMALL, LARGE):
        docs = load_table(spark, sf, "documents")
        n_corpus = docs.count()
        n_cand = (
            docs.select(
                F.explode(
                    F.expr("filter(split(text, ' '), x -> x != '')")
                ).alias("term"),
                "doc_id",
            )
            .filter(F.col("term").isin(*_QUERY_TERMS))
            .select("doc_id")
            .distinct()
            .count()
        )
        counts[sf] = (n_corpus, n_cand)
    (c_s, k_s), (c_l, k_l) = counts[SMALL], counts[LARGE]
    assert k_l / k_s <= (c_l / c_s) * GROWTH_SLACK


def test_linkage_pair_space_constant_across_scales(spark):
    """distinct-first: the compare space is the name vocabulary, which
    does not grow with the corpus — pair count must be IDENTICAL at
    sf0.01 and sf0.1 while supports scale ~10x."""
    small = x23_fuzzy_linkage(spark, SMALL).collect()
    release_scoped()
    large = x23_fuzzy_linkage(spark, LARGE).collect()
    release_scoped()
    assert {(r.name_a, r.name_b) for r in small} == {
        (r.name_a, r.name_b) for r in large
    }
    sup_small = sum(r.support_a + r.support_b for r in small)
    sup_large = sum(r.support_a + r.support_b for r in large)
    assert sup_large > 5 * sup_small  # supports grow with the corpus


def test_linkage_pairs_are_near_not_equal(spark, sf_dir):
    rows = x23_fuzzy_linkage(spark, sf_dir).collect()
    release_scoped()
    assert rows
    for r in rows:
        assert r.name_a < r.name_b  # ordered, no self/dup pairs
        assert 1 <= r.dist <= 3
        # blocking key: identical noun token
        assert r.name_a.split(" ")[1] == r.name_b.split(" ")[1]


def test_gap_fill_calendar_is_dense_and_fills(spark, sf_dir):
    rows = w9_gap_fill(spark, sf_dir).collect()
    release_scoped()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    n_days = {t: len(v) for t, v in by_type.items()}
    # every type spans the same dense calendar
    assert len(set(n_days.values())) == 1
    filled_gap = False
    for t, v in by_type.items():
        v.sort(key=lambda r: r.day)
        seen = False
        for r in v:
            if r.n_events > 0:
                seen = True
                assert r.ff_rev_micros == r.rev_micros
            elif seen:
                # gap after first observation: forward-filled, not null
                assert r.rev_micros is None
                assert r.ff_rev_micros is not None
                filled_gap = True
    assert filled_gap, "fixture produced no gaps - slice needs retuning"


def test_ema_matches_python_fold(spark, sf_dir):
    rows = sorted(w10_ema(spark, sf_dir).collect(), key=lambda r: r.d)
    release_scoped()
    assert rows
    ema = None
    for r in rows:
        ema = r.n * 1_000_000 if ema is None else (r.n * 1_000_000 + 4 * ema) // 5
        assert r.ema_micros == ema, r.d


def _bm25_python(texts: dict[int, str], terms) -> dict[int, tuple[int, int]]:
    """Independent integer BM25 fold (pure Python) replicating the spec:
    k1=1.2, b=0.75 as rationals, harmonic idf, all floor division."""
    words = {d: [w for w in t.split(" ") if w] for d, t in texts.items()}
    n_docs = len(words)
    avgdl = sum(len(w) for w in words.values()) // n_docs
    tf: dict[tuple[int, str], int] = {}
    for d, ws in words.items():
        for w in ws:
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict[str, int] = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    out: dict[int, tuple[int, int]] = {}
    for (d, w), f in tf.items():
        dl = len(words[d])
        lennorm_bp = 2500 + (7500 * dl) // avgdl
        sat_ppm = (220000 * f * 1000000) // (100000 * f + 12 * lennorm_bp)
        idf_ppm = 1000000 // df[w]
        hits, score = out.get(d, (0, 0))
        out[d] = (hits + 1, score + idf_ppm * sat_ppm // 1000000)
    return out


def test_bm25_matches_independent_python_fold(spark):
    """Controlled corpus through the real plan vs a from-scratch Python
    implementation of the integer BM25 spec — catches Spark-expression
    bugs (precedence, overflow, DIV order) that the oracle cannot,
    because the oracle replays the same formula."""
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        bm25_scores,
    )

    texts = {
        1: "spark spark spark pad pad",
        2: "spark pad",
        3: "vector merge stream pad pad pad",
        4: "pad pad pad",
        5: "spark vector pad pad pad pad pad pad pad pad pad pad",
    }
    terms = ("spark", "vector", "merge", "stream")
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_terms_hit, r.score_ppm)
        for r in bm25_scores(docs, terms, topk=10).collect()
    }
    release_scoped()
    assert got == _bm25_python(texts, terms)
    # tf saturation: d1 (tf=3) must beat d2 (tf=1, same term) but by
    # far less than 3x
    assert got[1][1] > got[2][1]
    assert got[1][1] < 2 * got[2][1]


def test_linkage_finds_planted_typo_pairs(spark):
    """Planted near-identical names through the real plan: typo pairs
    within a noun block are found with the exact expected distance;
    cross-noun pairs and far pairs are not."""
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        link_names,
    )

    rows = (
        [("red widget",)] * 3
        + [("rad widget",)] * 2      # dist 1 from "red widget"
        + [("xyz widget",)] * 1      # dist 3 from "red widget" (3 subs)
        + [("blue widget",)] * 1     # dist 4 from "red widget" — cut
        + [("red gizmo",)] * 4       # different noun block
    )
    parts = spark.createDataFrame(rows, "p_name string")
    got = {
        (r.name_a, r.name_b): (r.dist, r.support_a, r.support_b)
        for r in link_names(parts).collect()
    }
    release_scoped()
    assert got[("rad widget", "red widget")] == (1, 2, 3)
    assert got[("red widget", "xyz widget")][0] == 3
    assert ("blue widget", "red widget") not in got  # dist 4 > max
    assert ("red gizmo", "red widget") not in got  # cross-block


def test_bm25_portable_ln_accuracy_and_fold(spark, sf_dir):
    """The documented tolerance check for x21b (the production-ln BM25
    twin). The builtin ln is NOT cross-engine stable (JVM Math.log and
    DuckDB libm measurably differ by 1 ulp on this corpus's df inputs),
    so x21b uses the portable range-reduce + atanh-Horner construction;
    this test pins (1) that construction against math.log to < 1e-12
    relative on the actual idf inputs, and (2) the end-to-end e9 scores
    against an independent Python BM25 fold within the floor-boundary
    tolerance (each of the <=|terms| per-doc contributions can floor
    1 off when the true value sits within ~1e-4 of an integer)."""
    import math

    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _QUERY_TERMS,
        x21b_bm25_ln_topk,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [(r.doc_id, r.text.lower().split()) for r in docs.collect()]
    n_docs = len(rows)
    dls = {d: len(w) for d, w in rows}
    avgdl = sum(dls.values()) / n_docs
    tf: dict = {}
    for d, w in rows:
        for t in w:
            if t in _QUERY_TERMS:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    dfs: dict = {}
    for (_d, t) in tf:
        dfs[t] = dfs.get(t, 0) + 1

    # (1) portable ln vs math.log on the actual idf inputs
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _ATANH_POLY,
        _LN2,
        _SQRT2,
    )

    for t, df_v in sorted(dfs.items()):
        x = 1.0 + (float(n_docs - df_v) + 0.5) / (float(df_v) + 0.5)
        got = spark.sql(
            f"""SELECT CAST(lnk AS DOUBLE) * {_LN2}
                       + 2.0 * lz * {_ATANH_POLY} AS v
                FROM (SELECT *, lz * lz AS ls FROM
                (SELECT *, (lm - 1.0) / (lm + 1.0) AS lz FROM
                (SELECT *,
                   k0 + (CASE WHEN m0 > {_SQRT2} THEN 1 ELSE 0 END) AS lnk,
                   CASE WHEN m0 > {_SQRT2} THEN m0 * 0.5 ELSE m0 END AS lm
                 FROM (SELECT *,
                   lx / CAST(shiftleft(CAST(1 AS BIGINT), k0) AS DOUBLE)
                     AS m0
                 FROM (SELECT lx,
                   length(bin(CAST(floor(lx) AS BIGINT))) - 1 AS k0
                 FROM (SELECT CAST({x!r} AS DOUBLE) AS lx))))))"""
        ).collect()[0][0]
        assert abs(got - math.log(x)) <= 1e-12 * abs(math.log(x)), (
            t, x, got, math.log(x),
        )

    # (2) end-to-end scores vs an independent Python fold
    py_scores: dict = {}
    hits: dict = {}
    for (d, t), tf_v in tf.items():
        idf = math.log(
            1.0 + (float(n_docs - dfs[t]) + 0.5) / (float(dfs[t]) + 0.5)
        )
        sat = (tf_v * 2.2) / (
            tf_v + 1.2 * (0.25 + 0.75 * (float(dls[d]) / avgdl))
        )
        py_scores[d] = py_scores.get(d, 0) + math.floor(idf * sat * 1e9)
        hits[d] = hits.get(d, 0) + 1
    try:
        got = {
            r.doc_id: (r.n_terms_hit, r.score_e9)
            for r in x21b_bm25_ln_topk(spark, sf_dir).collect()
        }
    finally:
        release_scoped()
    assert got, "top-k must not be empty"
    n_terms = len(_QUERY_TERMS)
    for d, (nh, s) in got.items():
        assert nh == hits[d]
        assert abs(s - py_scores[d]) <= n_terms, (d, s, py_scores[d])


def test_x71b_ed2_planted_recall(spark, sf_dir):
    """SymSpell radius-2 completeness, pinned on the plants: every
    planted (original, typo) pair — 'q'-substitution at char 2 plus
    char-4 deletion, exactly Levenshtein distance 2 — must be mined,
    because the pair shares a 2-deletion variant by construction
    (delete chars 2 and 4 of the original == delete 'q' and char 3 of
    the typo). Also: zero result pairs exceed ed 2 (the verify step),
    and radius-1 kin keep ed == 1 (x71's surface is a subset)."""
    from acero_delta_lake_streaming_spark.operators.retrieval import (
        x71b_typo_pairs_ed2,
    )

    docs = load_table(spark, sf_dir, "documents")
    fw = F.expr(
        "get(filter(filter(split(text, ' '), x -> x != ''), "
        "x -> length(x) >= 6 AND x rlike '^[a-z]+$' "
        "AND substring(x, 2, 1) <> 'q'), 0)"
    )
    planted = {
        (r["fw"], r["fw"][0] + "q" + r["fw"][2] + r["fw"][4:])
        for r in docs.filter("doc_id % 17 = 11")
        .select(fw.alias("fw"))
        .filter(F.col("fw").isNotNull())
        .collect()
    }
    assert planted, "fixture must plant at least one typo"
    try:
        out = x71b_typo_pairs_ed2(spark, sf_dir).collect()
    finally:
        release_scoped()
    pairs = {tuple(sorted((r["word_a"], r["word_b"]))): r["ed"] for r in out}
    for orig, typo in planted:
        key = tuple(sorted((orig, typo)))
        assert key in pairs, f"planted pair {key} not mined"
        assert pairs[key] == 2
    for r in out:
        assert 1 <= r["ed"] <= 2


def test_x72_mmr_matches_python_greedy(spark, sf_dir):
    """x72 vs a from-scratch greedy MMR in Python over the same pool
    (BM25 top-25 + embeddings), replicating the expression order
    (rel = score/max as float64, cos via the same sequential fold,
    0.5*rel - 0.5*maxsim, ties by doc_id). The oracle replays the same
    SQL formula, so it can't catch a formula bug both sides share;
    this replay can. Exact equality on picks and e9-floored scores."""
    import math

    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _TOPK,
        _X72_K,
        _bm25_scored,
        x72_mmr_rerank,
    )
    from acero_delta_lake_streaming_spark.catalog import load_table
    from acero_delta_lake_streaming_spark.plans.cache import release_scoped

    try:
        top = sorted(
            (
                (r["doc_id"], r["score_e9"])
                for r in _bm25_scored(spark, sf_dir).collect()
            ),
            key=lambda t: (-t[1], t[0]),
        )[:_TOPK]
        emb = {
            r["vec_id"]: [float(v) for v in r["embedding"]]
            for r in load_table(spark, sf_dir, "embeddings").collect()
        }
        got = [
            (r["pick"], r["doc_id"], r["mmr_e9"])
            for r in x72_mmr_rerank(spark, sf_dir).collect()
        ]
    finally:
        release_scoped()
    mx = max(s for _, s in top)
    pool = {d: float(s) / float(mx) for d, s in top}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(emb[a], emb[b]):
            dot = dot + x * y
        na = math.sqrt(sum(x * x for x in emb[a]))
        nb = math.sqrt(sum(x * x for x in emb[b]))
        return dot / (na * nb)

    sel = [min(pool, key=lambda d: (-pool[d], d))]
    expect = [(1, sel[0], math.floor(pool[sel[0]] * 1e9))]
    for t in range(2, _X72_K + 1):
        best = None
        for d in pool:
            if d in sel:
                continue
            mmr = 0.5 * pool[d] - 0.5 * max(cos(d, s) for s in sel)
            if best is None or (-mmr, d) < (-best[1], best[0]):
                best = (d, mmr)
        sel.append(best[0])
        expect.append((t, best[0], math.floor(best[1] * 1e9)))
    assert sorted(got) == sorted(expect), (got, expect)


def test_x74_matches_python_replay(spark, sf_dir):
    """x74 vs a from-scratch Python late-interaction replay over the
    same pool: BM25/QL top-25 ranks, Rocchio PRF query (elementwise
    sum of the BM25 top-3 embeddings in doc_id order, float64),
    per-pair e9-floored slice cosines with the same sequential fold,
    maxsim, three-arm integer RRF. The oracle replays the same SQL
    formula, so it can't catch a formula bug both sides share; this
    replay can. Exact equality on every emitted row."""
    import math

    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _RRF_K,
        _RRF_TOP,
        _TOPK,
        _X74_D,
        _X74_MISS,
        _X74_PRF,
        _X74_T,
        _bm25_scored,
        _ql_scored,
        x74_late_interaction,
    )
    from acero_delta_lake_streaming_spark.catalog import load_table
    from acero_delta_lake_streaming_spark.plans.cache import release_scoped

    def ranks(rows):
        top = sorted(rows, key=lambda t: (-t[1], t[0]))[:_TOPK]
        return {d: i + 1 for i, (d, _s) in enumerate(top)}

    try:
        bm = ranks([
            (r["doc_id"], r["score_e9"])
            for r in _bm25_scored(spark, sf_dir).collect()
        ])
        release_scoped()
        ql = ranks([
            (r["doc_id"], r["score_e9"])
            for r in _ql_scored(spark, sf_dir).collect()
        ])
        release_scoped()
        emb = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        }
        got = {
            r["doc_id"]: (
                r["rank_bm25"], r["rank_ql"], r["rank_li"],
                r["li_e9"], r["rrf_e6"],
            )
            for r in x74_late_interaction(spark, sf_dir).collect()
        }
    finally:
        release_scoped()

    # PRF query: elementwise sum of bm25 top-3 embeddings, doc_id order
    prf_ids = sorted(d for d, rk in bm.items() if rk <= _X74_PRF)
    qv = [0.0] * len(emb[prf_ids[0]])
    for d in prf_ids:
        qv = [a + b for a, b in zip(qv, emb[d])]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def maxsim(de):
        total = 0
        for t in range(_X74_T):
            qs_ = qv[_X74_D * t:_X74_D * (t + 1)]
            qn = math.sqrt(fold_dot(qs_, qs_))
            best = None
            for j in range(_X74_T):
                ds = de[_X74_D * j:_X74_D * (j + 1)]
                dn = math.sqrt(fold_dot(ds, ds))
                denom = qn * dn
                if denom == 0.0:
                    continue
                c = math.floor(1e9 * (fold_dot(qs_, ds) / denom))
                best = c if best is None else max(best, c)
            total += best if best is not None else 0
        return total

    pool = sorted(set(bm) | set(ql))
    dense = {
        d: (maxsim(emb[d]) if d in emb else _X74_MISS) for d in pool
    }
    li_rank = {
        d: i + 1
        for i, d in enumerate(
            sorted(pool, key=lambda d: (-dense[d], d))
        )
    }
    expected = {}
    for d in pool:
        rb, rq, rl = bm.get(d, 0), ql.get(d, 0), li_rank[d]
        rrf = (
            (1000000 // (_RRF_K + rb) if rb else 0)
            + (1000000 // (_RRF_K + rq) if rq else 0)
            + 1000000 // (_RRF_K + rl)
        )
        expected[d] = (rb, rq, rl, dense[d], rrf)
    want = dict(
        sorted(expected.items(), key=lambda kv: (-kv[1][4], kv[0]))
        [:_RRF_TOP]
    )
    assert got == want


def test_x76_cross_encoder_quarantine_and_ranks(spark):
    """Planted-failure corpus through the exact x76 mapInPandas plan
    (cross_encoder_scores): md5-gated provider failures quarantine
    (ce_failed = 1, rank_ce = 0, ce_ppm = -1) while KEEPING their
    lexical ranks — the stage never crashes (UD3); surviving rows rank
    1..k in (ce_ppm desc, doc_id) order; and every ce_ppm equals the
    mock rule recomputed independently in Python."""
    import hashlib

    from acero_delta_lake_streaming_spark.operators.retrieval import (
        cross_encoder_scores,
    )

    query = "test query"
    fails, oks = [], []
    i = 0
    while len(fails) < 3 or len(oks) < 9:
        text = f"doc body {i}"
        h = hashlib.md5(f"{query}|{text}".encode()).hexdigest()
        (fails if h[0] == "f" else oks).append(text)
        i += 1
    texts = fails[:3] + oks[:9]
    rows = [
        (j, j + 1, 0 if j % 2 else j + 1, t) for j, t in enumerate(texts)
    ]
    pool = spark.createDataFrame(
        rows, "doc_id long, rank_bm25 long, rank_ql long, text string"
    )
    out = {
        r.doc_id: r for r in cross_encoder_scores(pool, query).collect()
    }
    assert len(out) == len(texts)
    exp = {}
    for j, t in enumerate(texts):
        h = hashlib.md5(f"{query}|{t}".encode()).hexdigest()
        exp[j] = None if h[0] == "f" else int(h[1:5], 16)
    assert sum(1 for v in exp.values() if v is None) == 3  # exercised
    for j, r in out.items():
        if exp[j] is None:
            assert (r.ce_failed, r.rank_ce, r.ce_ppm) == (1, 0, -1)
        else:
            assert r.ce_failed == 0 and r.ce_ppm == exp[j]
        # lexical ranks ride through the Python stage untouched
        assert (r.rank_bm25, r.rank_ql) == (j + 1, 0 if j % 2 else j + 1)
    ok_sorted = sorted(
        [j for j in exp if exp[j] is not None],
        key=lambda j: (-exp[j], j),
    )
    assert [out[j].rank_ce for j in ok_sorted] == list(
        range(1, len(ok_sorted) + 1)
    )


def test_x77_matches_python_replay_and_expansion_fires(spark, sf_dir):
    """x77's full expansion-index scoring replayed from scratch in
    Python over the raw parquet (tokenize, md5 weights, the < '8'
    expansion gate, ceil-half weights, sparse dot, top-25 with
    deterministic ties) — and the expansion channel must be
    NON-VACUOUS: at least one scored doc carries an expansion-key
    contribution ('merge' → 'egrem' passes both gates on this query),
    so the plan's expansion arm is exercised, not dead code."""
    import hashlib
    from collections import defaultdict

    import pyarrow.parquet as pq

    from acero_delta_lake_streaming_spark.operators.retrieval import (
        _X77_TOP,
        _x77_qvec,
        x77_learned_sparse,
    )
    from acero_delta_lake_streaming_spark.plans.cache import release_scoped

    got = [
        (r.doc_id, r.n_keys_hit, r.score)
        for r in x77_learned_sparse(spark, sf_dir).collect()
    ]
    release_scoped()

    qvec = _x77_qvec()
    keys = set(qvec)
    rkeys = {k[::-1] for k in keys}
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    scores: dict[int, dict[str, int]] = defaultdict(
        lambda: defaultdict(int)
    )
    for row in tbl:
        for term in (t for t in row["text"].split(" ") if t):
            h = hashlib.md5(term.encode()).hexdigest()
            wt = int(h[1], 16) + 1
            if term in keys:
                scores[row["doc_id"]][term] += wt
            if term in rkeys and h[0] < "8":
                scores[row["doc_id"]][term[::-1]] += (wt + 1) // 2
    per_doc = {}
    expansion_seen = False
    for doc_id, ent in scores.items():
        hit = {k: wd for k, wd in ent.items() if k in qvec}
        if not hit:
            continue
        if any(k not in ("spark", "vector", "merge", "stream") for k in hit):
            expansion_seen = True
        per_doc[doc_id] = (
            len(hit), sum(wd * qvec[k] for k, wd in hit.items())
        )
    want = sorted(
        ((d, n, s) for d, (n, s) in per_doc.items()),
        key=lambda t: (-t[2], t[0]),
    )[:_X77_TOP]
    assert got == want
    assert expansion_seen
