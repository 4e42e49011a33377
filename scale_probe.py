"""Scale probe: drive the LSH dedup + ANN candidate generators at
sf1-equivalent (a 10x in-flight replication of sf0.1) and report
candidate-volume growth and per-doc throughput vs plain sf0.1.

This extends tests/test_scale_growth.py one decade further than the
shipped fixtures go. No files are written: replicas are built in the
logical plan by unioning the sf0.1 corpus 10 times with shifted ids and
a per-replica letter rotation (so replica shingles don't collide with
the original's — candidate growth is measured on *unrelated* content,
the honest worst case for bucket occupancy). Embedding replicas keep
their direction (sign-LSH and cosine are scale-invariant), so ANN
bucket occupancy grows exactly 10x — the designed O(N) behavior.

Usage: python scale_probe.py   (prints one JSON line; ~2-3 min)
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

sys.path.insert(0, "/root/repo")

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.operators.dedup import (
    _JACCARD_THRESHOLD,
    _band_rows,
    _incremental_corpus,
    _near_dup_corpus,
    _shingle_rows,
    _signatures_and_candidates,
)
from acero_delta_lake_streaming_spark.operators.similarity import (
    _lsh_candidate_ids,
    _semdedup_pair_ids,
)
from acero_delta_lake_streaming_spark.plans.cache import (
    release_scoped,
    scoped_persist,
)
from acero_delta_lake_streaming_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
_ROT = "etaoinshrd"  # 10 most frequent letters; rotating them rewrites
# nearly every word, so replica shingle sets are disjoint from the base


def replicate_docs(docs: DataFrame, times: int) -> DataFrame:
    parts = []
    for i in range(times):
        rot = _ROT[i:] + _ROT[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.translate("text", _ROT, rot).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_pairs(corpus: DataFrame) -> tuple[int, int, int, float]:
    """(corpus_n, shingle_n, candidate_n, pair-pipeline seconds)."""
    t0 = time.time()
    sh = scoped_persist(_shingle_rows(corpus))
    shingle_n = sh.count()
    sigs, cand = _signatures_and_candidates(sh)
    cand_n = cand.count()
    # full verification pass (intersection join + Jaccard filter),
    # mirroring x2's tail
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    counts = sigs.select("doc_id", "n_sh")
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    n_pairs = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= _JACCARD_THRESHOLD)
        .count()
    )
    corpus_n = corpus.count()
    release_scoped()
    del n_pairs
    return corpus_n, shingle_n, cand_n, time.time() - t0


def main() -> None:
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    out: dict[str, dict] = {}

    base = _near_dup_corpus(docs)
    big = _near_dup_corpus(replicate_docs(docs, 10).repartition(32))
    for tag, corpus in (("x1", base), ("x10", big)):
        n, sh_n, cand_n, secs = minhash_pairs(corpus)
        out[f"minhash_{tag}"] = {
            "docs": n,
            "shingles": sh_n,
            "candidates": cand_n,
            "sec": round(secs, 1),
            "docs_per_sec": round(n / secs, 0),
        }
        print(f"minhash_{tag}: {out[f'minhash_{tag}']}", file=sys.stderr)

    emb = load_table(spark, SF_DIR, "embeddings")
    emb10 = None
    for i in range(10):
        part = emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.expr(
                f"transform(embedding, x -> x * {1.0 + i / 10.0})"
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        emb10 = part if emb10 is None else emb10.unionByName(part)
    for tag, e in (("x1", emb), ("x10", emb10.repartition(32))):
        t0 = time.time()
        n = e.count()
        cand_n = _lsh_candidate_ids(spark, e).count()
        out[f"ann_{tag}"] = {
            "vectors": n,
            "candidates": cand_n,
            "sec": round(time.time() - t0, 1),
        }
        print(f"ann_{tag}: {out[f'ann_{tag}']}", file=sys.stderr)

    # SemDeDup (x14): adaptive planes must hold candidate growth ~linear
    # across the same decade step (the fixed-plane version was ~x100 here)
    for tag, e in (("x1", emb), ("x10", emb10.repartition(32))):
        t0 = time.time()
        corpus = e.select("vec_id", "embedding")
        n = corpus.count()
        cand_n = _semdedup_pair_ids(spark, corpus).count()
        out[f"semdedup_{tag}"] = {
            "vectors": n,
            "candidates": cand_n,
            "sec": round(time.time() - t0, 1),
        }
        print(f"semdedup_{tag}: {out[f'semdedup_{tag}']}", file=sys.stderr)

    # Incremental near-dup (x30): a FIXED delta batch probes the band
    # index of a 1x vs 10x corpus. MinHash band keys collide on
    # SIMILARITY, not capacity (the key space is 3x32-bit tuples), so
    # probe candidates must track the delta's true-match mass — the
    # replicas' rotated shingles are disjoint, so growing the corpus
    # 10x should leave the probe volume ~flat. That flatness is what
    # makes nightly incremental dedup O(|delta|) at any corpus size.
    corpus_all, off_df = _incremental_corpus(docs)
    off = off_df.collect()[0]["off"]  # delta ids live in [off, 3*off)
    # replicas offset by 10M below; a corpus big enough for the delta
    # namespace to reach that would alias replica ids — refuse loudly
    # rather than silently truncate the probe
    assert 3 * off <= 10_000_000, f"corpus too large for replica ids ({off=})"
    delta = corpus_all.filter(
        (F.col("doc_id") >= off) & (F.col("doc_id") < 3 * off)
    )
    for tag, base_corpus in (
        ("x1", docs.select("doc_id", "text")),
        ("x10", replicate_docs(docs, 10).repartition(32)),
    ):
        t0 = time.time()
        corpus = base_corpus.unionByName(delta)
        sh = scoped_persist(_shingle_rows(corpus))
        sigs, _ = _signatures_and_candidates(sh)
        bands = _band_rows(sigs)
        bands_new = bands.filter(
            (F.col("doc_id") >= off) & (F.col("doc_id") < 3 * off)
        )
        a, b = bands.alias("a"), bands_new.alias("b")
        probe_n = (
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
        n = corpus.count()
        release_scoped()
        out[f"incremental_{tag}"] = {
            "corpus": n,
            "probe_candidates": probe_n,
            "sec": round(time.time() - t0, 1),
        }
        print(f"incremental_{tag}: {out[f'incremental_{tag}']}", file=sys.stderr)

    # Incremental graph edges (st27, round 13): a FIXED batch of new
    # vectors probes the bucket state of a 1x vs 10x corpus under each
    # corpus's adaptive geometry. The adaptive plane count holds
    # E[bucket] ~constant, so probe-edge volume must track the BATCH,
    # not the corpus — the O(batch) nightly-ingest shape st27's
    # foreachBatch sink ships (old x old pairs are never re-probed).
    from acero_delta_lake_streaming_spark.operators.similarity import (
        _PPT_SPARK,
        _sign_buckets_ppt,
    )

    delta_vec = emb.select("vec_id", "embedding").filter(
        "vec_id % 5 = 2"
    ).select(
        (F.col("vec_id") + F.lit(90_000_000)).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    for tag, e in (("x1", emb), ("x10", emb10.repartition(32))):
        t0 = time.time()
        corpus = e.select("vec_id", "embedding")
        ppt = corpus.agg(F.count(F.lit(1)).alias("cnt")).select(
            F.expr(_PPT_SPARK).alias("ppt")
        )
        bk_state = scoped_persist(_sign_buckets_ppt(spark, corpus, ppt))
        bk_new = _sign_buckets_ppt(spark, delta_vec, ppt)
        probe_n = (
            bk_new.select(F.col("vec_id").alias("a"), "tbl", "bucket")
            .join(
                bk_state.unionByName(bk_new).select(
                    F.col("vec_id").alias("b"), "tbl", "bucket"
                ),
                ["tbl", "bucket"],
            )
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("src"),
                F.greatest("a", "b").alias("dst"),
            )
            .distinct()
            .count()
        )
        n = corpus.count()
        nb = delta_vec.count()
        release_scoped()
        out[f"graph_delta_{tag}"] = {
            "corpus": n,
            "batch": nb,
            "probe_edges": probe_n,
            "sec": round(time.time() - t0, 1),
        }
        print(
            f"graph_delta_{tag}: {out[f'graph_delta_{tag}']}",
            file=sys.stderr,
        )

    # Round-9 additions (VERDICT r8 item 5): the round-8/9 dedup shapes
    # measured across the REAL fixture decade sf0.01 -> sf0.1 (500 ->
    # 5000 docs). x57's cost driver is the map-side pair expansion
    # (sum of `shared` = total expanded structs, Heaps-sublinear per
    # source); x60b's is the df-capped candidate volume Σ C(df,2);
    # x65 reports its own per-config candidate volumes — the probe
    # records the shipped 4x3 config's growth.
    from acero_delta_lake_streaming_spark.operators.dedup import (
        _X60B_CAP,
        _X60_SNIP,
        _WORDS_SPARK,
        x57_source_overlap,
        x60b_corpus_containment,
        x65_lsh_sweep,
    )

    for tag, sfd in (("s001", "/root/testdata/sf0.01"), ("s01", SF_DIR)):
        d = load_table(spark, sfd, "documents")

        t0 = time.time()
        pair_structs = (
            x57_source_overlap(spark, sfd)
            .agg(F.sum("shared").cast("bigint").alias("s"))
            .collect()[0]["s"]
        )
        release_scoped()
        out[f"x57_{tag}"] = {
            "pair_structs": int(pair_structs),
            "sec": round(time.time() - t0, 1),
        }

        t0 = time.time()
        base = d.select("doc_id", "text")
        snippets = base.filter(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + F.lit(2000000)).alias("doc_id"),
            F.expr(
                f"concat_ws(' ', slice({_WORDS_SPARK}, 1, {_X60_SNIP}))"
            ).alias("text"),
        )
        cand = (
            _shingle_rows(base.unionByName(snippets))
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df").between(2, _X60B_CAP))
            .agg(
                F.sum(F.expr("df * (df - 1) / 2"))
                .cast("bigint")
                .alias("c")
            )
            .collect()[0]["c"]
        )
        emitted = x60b_corpus_containment(spark, sfd).count()
        release_scoped()
        out[f"x60b_{tag}"] = {
            "candidates": int(cand),
            "emitted": int(emitted),
            "sec": round(time.time() - t0, 1),
        }

        t0 = time.time()
        sweep = {
            r["bands"]: (r["n_candidates"], r["recall_bp"])
            for r in x65_lsh_sweep(spark, sfd).collect()
        }
        release_scoped()
        out[f"x65_{tag}"] = {
            "cand_4x3": int(sweep[4][0]),
            "recall_bp_4x3": int(sweep[4][1]),
            "sec": round(time.time() - t0, 1),
        }

        # x5f: emitted pairs under the CORPUS-ADAPTIVE band geometry
        # (round 10): band-key width grows with log2(n_media), so the
        # decade ratio should read ~linear (measured 11.2x vs the
        # round-9 fixed-1024-cell geometry's 21.5x)
        from acero_delta_lake_streaming_spark.operators.multimodal import (
            x5f_media_phash_neardup,
        )

        t0 = time.time()
        x5f = x5f_media_phash_neardup(spark, sfd)
        emitted5f = x5f.count()
        release_scoped()
        out[f"x5f_{tag}"] = {
            "emitted": int(emitted5f),
            "sec": round(time.time() - t0, 1),
        }
        # x69: cross-lingual candidate volume under the same adaptive
        # sign-LSH (round 10) — planes grow with log2(n), so non-en x en
        # bucket-mate pairs should track ~linear across the decade
        from acero_delta_lake_streaming_spark.operators.similarity import (
            _adaptive_sign_buckets,
            _x69_corpus,
            x69_bitext_mining,
        )

        t0 = time.time()
        e69 = load_table(spark, sfd, "embeddings")
        corpus69 = scoped_persist(_x69_corpus(d, e69))
        b69 = _adaptive_sign_buckets(
            spark, corpus69.select("vec_id", "embedding")
        )
        lb69 = b69.join(corpus69.select("vec_id", "lang"), "vec_id")
        cand69 = (
            lb69.filter("lang <> 'en'")
            .selectExpr("vec_id AS sid_", "tbl", "bucket")
            .join(
                lb69.filter("lang = 'en'")
                .selectExpr("vec_id AS tid_", "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .select("sid_", "tid_")
            .distinct()
            .count()
        )
        mined69 = x69_bitext_mining(spark, sfd).count()
        release_scoped()
        out[f"x69_{tag}"] = {
            "candidates": int(cand69),
            "mined": int(mined69),
            "sec": round(time.time() - t0, 1),
        }
        # x71b (round 11): SymSpell radius-2 key-row and candidate
        # volume — variants multiply VOCAB (Heaps-sublinear in corpus
        # tokens) by ~L^2/2, so both counts should grow slower than
        # the 10x document decade
        from acero_delta_lake_streaming_spark.operators.dedup import (
            _WORDS_SPARK,
        )
        from acero_delta_lake_streaming_spark.operators.retrieval import (
            _X71_MIN_N,
            _X71B_MIN_LEN,
            _X71B_VARS_SPARK,
        )

        t0 = time.time()
        toks71 = d.select(F.explode(F.expr(_WORDS_SPARK)).alias("w"))
        vocab71 = (
            toks71.filter(
                (F.length("w") >= _X71B_MIN_LEN)
                & F.col("w").rlike("^[a-z]+$")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= _X71_MIN_N)
        )
        vars71 = scoped_persist(
            vocab71.select(
                "w", F.explode(F.expr(_X71B_VARS_SPARK)).alias("v")
            )
        )
        nvars71 = vars71.count()
        cand71 = (
            vars71.selectExpr("w AS wa", "v")
            .join(vars71.selectExpr("w AS wb", "v"), "v")
            .filter("wa < wb")
            .select("wa", "wb")
            .distinct()
            .count()
        )
        release_scoped()
        out[f"x71b_{tag}"] = {
            "variant_rows": int(nvars71),
            "candidates": int(cand71),
            "sec": round(time.time() - t0, 1),
        }
        # x3i (round 11, reworked round 12): k-NN graph build pair
        # volume. Since round 12 the SHIPPED path is the adaptive
        # bucketing (graph_pairs_adaptive — measured ~linear); the
        # fixed 4x3 geometry stays measured alongside as the
        # counterfactual that justified the swap (16.1x vs 4.3x over
        # the decade, VERDICT r11 item 1).
        from acero_delta_lake_streaming_spark.operators.similarity import (
            _sign_buckets,
        )

        t0 = time.time()
        b3f = _sign_buckets(spark, e69)
        gp_fixed = (
            b3f.selectExpr("vec_id AS src", "tbl", "bucket")
            .join(
                b3f.selectExpr("vec_id AS dst", "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter("src < dst")
            .select("src", "dst")
            .distinct()
            .count()
        )
        b3a = _adaptive_sign_buckets(
            spark, e69.select("vec_id", "embedding")
        )
        gp_adapt = (
            b3a.selectExpr("vec_id AS src", "tbl", "bucket")
            .join(
                b3a.selectExpr("vec_id AS dst", "tbl", "bucket"),
                ["tbl", "bucket"],
            )
            .filter("src < dst")
            .select("src", "dst")
            .distinct()
            .count()
        )
        out[f"x3i_{tag}"] = {
            "vectors": int(e69.count()),
            "graph_pairs_fixed": int(gp_fixed),
            "graph_pairs_adaptive": int(gp_adapt),
            "sec": round(time.time() - t0, 1),
        }
        # x73 (round 12): unigram-LM trainer input volume. Everything
        # after the one corpus shuffle is VOCAB-sized — distinct words
        # and their <= L*M seed substrings should stay ~flat across the
        # document decade (closed fixture vocabulary; Heaps-sublinear
        # on a real corpus).
        from acero_delta_lake_streaming_spark.operators.text import (
            _x73_seed_counts,
            _x73_words,
        )

        t0 = time.time()
        w73 = _x73_words(spark, sfd)
        nwords73 = w73.count()
        nseed73 = _x73_seed_counts(w73).count()
        out[f"x73_{tag}"] = {
            "distinct_words": int(nwords73),
            "seed_pieces": int(nseed73),
            "sec": round(time.time() - t0, 1),
        }
        for k in (f"x57_{tag}", f"x60b_{tag}", f"x65_{tag}",
                  f"x5f_{tag}", f"x69_{tag}", f"x71b_{tag}",
                  f"x3i_{tag}", f"x73_{tag}"):
            print(f"{k}: {out[k]}", file=sys.stderr)

    m1, m10 = out["minhash_x1"], out["minhash_x10"]
    a1, a10 = out["ann_x1"], out["ann_x10"]
    s1, s10 = out["semdedup_x1"], out["semdedup_x10"]
    i1, i10 = out["incremental_x1"], out["incremental_x10"]
    out["growth"] = {
        "minhash_cand_ratio": round(m10["candidates"] / m1["candidates"], 2),
        "minhash_doc_ratio": round(m10["docs"] / m1["docs"], 2),
        "ann_cand_ratio": round(a10["candidates"] / a1["candidates"], 2),
        "ann_vec_ratio": round(a10["vectors"] / a1["vectors"], 2),
        "semdedup_cand_ratio": round(s10["candidates"] / s1["candidates"], 2),
        "semdedup_vec_ratio": round(s10["vectors"] / s1["vectors"], 2),
        "incremental_probe_ratio": round(
            i10["probe_candidates"] / max(i1["probe_candidates"], 1), 2
        ),
        "incremental_corpus_ratio": round(i10["corpus"] / i1["corpus"], 2),
        "graph_delta_probe_ratio": round(
            out["graph_delta_x10"]["probe_edges"]
            / max(out["graph_delta_x1"]["probe_edges"], 1), 2
        ),
        "graph_delta_corpus_ratio": round(
            out["graph_delta_x10"]["corpus"]
            / out["graph_delta_x1"]["corpus"], 2
        ),
        # fixture decade (10x docs): candidate growth for the r8/r9 shapes
        "x57_struct_ratio": round(
            out["x57_s01"]["pair_structs"]
            / max(out["x57_s001"]["pair_structs"], 1), 2
        ),
        "x60b_cand_ratio": round(
            out["x60b_s01"]["candidates"]
            / max(out["x60b_s001"]["candidates"], 1), 2
        ),
        "x65_cand_ratio": round(
            out["x65_s01"]["cand_4x3"]
            / max(out["x65_s001"]["cand_4x3"], 1), 2
        ),
        "x5f_emitted_ratio": round(
            out["x5f_s01"]["emitted"]
            / max(out["x5f_s001"]["emitted"], 1), 2
        ),
        "x69_cand_ratio": round(
            out["x69_s01"]["candidates"]
            / max(out["x69_s001"]["candidates"], 1), 2
        ),
        "x71b_variant_ratio": round(
            out["x71b_s01"]["variant_rows"]
            / max(out["x71b_s001"]["variant_rows"], 1), 2
        ),
        "x71b_cand_ratio": round(
            out["x71b_s01"]["candidates"]
            / max(out["x71b_s001"]["candidates"], 1), 2
        ),
        "x3i_pairs_fixed_ratio": round(
            out["x3i_s01"]["graph_pairs_fixed"]
            / max(out["x3i_s001"]["graph_pairs_fixed"], 1), 2
        ),
        "x3i_pairs_adaptive_ratio": round(
            out["x3i_s01"]["graph_pairs_adaptive"]
            / max(out["x3i_s001"]["graph_pairs_adaptive"], 1), 2
        ),
        "x73_seed_ratio": round(
            out["x73_s01"]["seed_pieces"]
            / max(out["x73_s001"]["seed_pieces"], 1), 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
