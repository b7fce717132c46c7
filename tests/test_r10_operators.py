"""Round-10 operators: PQ relation serve, iterative BPE training,
exact-substring duplicate spans, matrix profile, Kendall tau-b."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sim_pq_relation_topk — the last cell of the compression matrix
# ---------------------------------------------------------------------------


def test_pq_relation_plan_and_shape(spark):
    """Plan pin for the relation scale shape (mirrors the r8 relation-ANN
    pins): the candidate join must be a shuffle join on the cell key —
    never a broadcast of the query relation — and every query serves
    exactly ranks 1..3 with non-negative ADC estimates."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        pq_topk_relation,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = pq_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2, pool=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert "cell" not in ln.split("BroadcastHashJoin")[1].split(",")[0]
    rows = out.collect()
    nq = emb.count()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == nq
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3]
        assert all(r.adc >= 0.0 for r in rs)
        assert all(r.neighbor_id != q for r in rs)


def test_pq_relation_adc_matches_numpy(spark):
    """The integer-exact ADC estimate must equal a numpy recomputation of
    sum-of-block squared-L2 to the candidate's assigned codewords (the
    same audit `sim_pq_adc_topk` carries, applied to the relation path)."""
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        pq_assign,
        pq_topk_relation,
    )

    emb = load_table(spark, SF, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    cb = {i: vecs[i] for i in range(_PQ_K)}
    codes = {}
    for r in pq_assign(emb).collect():
        codes.setdefault(r.vec_id, {})[r.subspace] = r.code
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = pq_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2, pool=10).collect()
    for r in out[:50]:
        q = vecs[r.query_id]
        adci = 0
        for s in range(_PQ_M):
            cw = cb[codes[r.neighbor_id][s]]
            lo, hi = s * _PQ_SUB, (s + 1) * _PQ_SUB
            d = 0.0
            for x, y in zip(q[lo:hi], cw[lo:hi]):
                d += (x - y) * (x - y)
            adci += int(math.floor(d * 1e9 + 0.5))
        assert abs(r.adc - adci / 1e9) < 2e-6


# ---------------------------------------------------------------------------
# corpus_bpe_train_merges — iterative BPE with hand-computed dynamics
# ---------------------------------------------------------------------------


def test_bpe_train_merges_hand_example(spark):
    """Three merge rounds on 'aaab aaab aab' — exercises the parts a
    static pair table can't show: greedy left-to-right merge ("aaa" with
    merge (a,a) -> [aa, a]), counts recomputed AFTER the rewrite, and the
    deterministic (count DESC, pair ASC) tie-break in round 2."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        bpe_train_merges,
    )

    df = spark.createDataFrame([("aaab aaab aab",)], ["text"])
    rows = sorted(
        map(tuple, bpe_train_merges(df, rounds=3).collect())
    )
    assert rows == [
        (1, "a", "a", 5),
        (2, "a", "b", 2),   # ties (aa,a)=2 and (a,b)=2 -> 'a' < 'aa'
        (3, "aa", "ab", 2),
    ]


def test_bpe_train_round1_matches_first_merge_table(spark):
    """Round 1 of the iterative trainer must pick exactly the rank-1 pair
    of the static `corpus_bpe_first_merges` table (same counts, same
    tie-break) — the two operators share their first step by definition."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        bpe_train_merges,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    docs = load_table(spark, SF, "documents")
    r1 = bpe_train_merges(docs, rounds=1).collect()[0]
    first = [
        r
        for r in all_queries()["corpus_bpe_first_merges"].fn(spark, SF).collect()
        if r.merge_rank == 1
    ][0]
    assert r1.left_sym + r1.right_sym == first.pair
    assert r1.occurrences == first.occurrences


# ---------------------------------------------------------------------------
# dedup_substring_spans — maximal duplicated token intervals
# ---------------------------------------------------------------------------


def test_substring_spans_crafted(spark):
    """A 10-token phrase shared by two docs at different offsets yields
    exactly one maximal span per doc covering the phrase (3 duplicated
    8-shingles merged); a doc shorter than k emits nothing; unique text
    emits nothing."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        duplicate_substring_spans,
    )

    phrase = " ".join(f"p{i}" for i in range(1, 11))
    d1 = " ".join(f"a{i}" for i in range(1, 5)) + " " + phrase + " " + " ".join(
        f"b{i}" for i in range(1, 17)
    )  # phrase at token offsets 5..14 of 30
    d2 = phrase + " " + " ".join(f"c{i}" for i in range(1, 11))  # offsets 1..10
    d3 = "x1 x2 x3 x4 x5"  # shorter than k
    df = spark.createDataFrame(
        [("d1", d1), ("d2", d2), ("d3", d3)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in duplicate_substring_spans(df, k=8).collect()}
    assert set(rows) == {"d1", "d2"}
    assert (rows["d1"].span_start, rows["d1"].span_end) == (5, 14)
    assert (rows["d2"].span_start, rows["d2"].span_end) == (1, 10)
    assert rows["d1"].span_tokens == 10 and rows["d1"].n_shingles == 3
    assert rows["d2"].span_tokens == 10 and rows["d2"].n_shingles == 3


def test_substring_spans_bounds_on_corpus(spark):
    """On the real corpus: every span is at least k tokens, offsets are
    ordered, and the shingle count is bounded by the span's offset
    range (equality when every in-span offset is duplicated)."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["dedup_substring_spans"].fn(spark, SF).collect()
    assert rows, "sf0.001 documents contain boilerplate duplicates"
    for r in rows:
        assert r.span_tokens == r.span_end - r.span_start + 1
        assert r.span_tokens >= 8
        assert 1 <= r.n_shingles <= r.span_end - r.span_start - 8 + 2


# ---------------------------------------------------------------------------
# ts_matrix_profile — numpy twin + planted motif
# ---------------------------------------------------------------------------


def _numpy_matrix_profile(v, w=5, zone=3):
    n = len(v)
    wins = {}
    for i in range(1, n - w + 2):
        seg = v[i - 1 : i - 1 + w]
        s1 = sum(seg)
        s2 = sum(x * x for x in seg)
        wins[i] = (s1, w * s2 - s1 * s1)
    out = {}
    for i, (s1i, deni) in wins.items():
        best = None
        for j, (s1j, denj) in wins.items():
            if abs(i - j) < zone or deni <= 0 or denj <= 0:
                continue
            qt = sum(
                v[i - 1 + t] * v[j - 1 + t] for t in range(w)
            )
            corr = (w * qt - s1i * s1j) / (math.sqrt(deni) * math.sqrt(denj))
            d2 = 2.0 * w * (1.0 - corr)
            key = (round(d2, 9), j)
            if best is None or key < best[0]:
                best = (key, j, d2)
        if best is not None:
            out[i] = (best[1], math.sqrt(max(best[2], 0.0)))
    return out


def test_matrix_profile_numpy_twin_and_planted_motif(spark):
    """One key, one tick per day: the operator must reproduce a brute-
    force recomputation exactly, and the planted scaled-and-shifted motif
    (z-normalization invariant) must surface as a zero-distance pair."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        matrix_profile_daily,
    )

    pat = [0.0, 4.0, 8.0, 4.0, 0.0]
    mid = [1.25, 7.5, 2.75, 9.0, 0.25]
    vals = pat + mid + [2.0 * x + 3.0 for x in pat] + [5.5, 1.75, 8.25, 3.0, 6.5]
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("m", base + datetime.timedelta(days=i), float(x), i)
        for i, x in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value", "event_id"])
    got = {
        r.win_idx: (r.nn_idx, r.mp_dist)
        for r in matrix_profile_daily(df, key="event_type").collect()
    }
    v = [int(math.floor(x * 100 + 0.5)) for x in vals]
    want = _numpy_matrix_profile(v)
    assert set(got) == set(want)
    for i, (j, dist) in want.items():
        assert got[i][0] == j
        assert abs(got[i][1] - dist) < 1e-6
    # the planted motif: window 1 and window 11 are affine copies
    assert got[1][0] == 11 and got[1][1] == 0.0
    assert got[11][0] == 1 and got[11][1] == 0.0


def test_matrix_profile_on_events_shape(spark):
    """Real table: every profile row has a non-trivial neighbor
    (|i-j| >= zone), distances are non-negative, one row per window."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["ts_matrix_profile"].fn(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert (r.event_type, r.win_idx) not in seen
        seen.add((r.event_type, r.win_idx))
        assert abs(r.win_idx - r.nn_idx) >= 3
        assert r.mp_dist >= 0.0


# ---------------------------------------------------------------------------
# stats_kendall_tau — brute-force twin
# ---------------------------------------------------------------------------


def test_kendall_tau_bruteforce_twin(spark):
    """Concordant/discordant/tau-b from the grid prefix sums must equal
    the O(n²) definition on the same quantized points — including ties
    on x, on y, and on both."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        kendall_tau_grid,
    )

    pts = [
        ("A", 1, 2), ("A", 1, 2), ("A", 2, 1), ("A", 3, 4), ("A", 3, 5),
        ("A", 4, 4), ("A", 5, 9), ("A", 6, 3), ("A", 6, 3), ("A", 7, 7),
        ("B", 1, 9), ("B", 2, 8), ("B", 3, 7), ("B", 4, 6), ("B", 5, 5),
    ]
    df = spark.createDataFrame(pts, ["g", "x", "y"])
    out = {
        r.g: r
        for r in kendall_tau_grid(
            df, "g", F.col("x").cast("long"), F.col("y").cast("long"),
            nx=10, ny=10,
        ).collect()
    }
    for g in ("A", "B"):
        sub = [(x, y) for gg, x, y in pts if gg == g]
        c = d = tx = ty = 0
        for i in range(len(sub)):
            for j in range(i + 1, len(sub)):
                dx = sub[i][0] - sub[j][0]
                dy = sub[i][1] - sub[j][1]
                if dx == 0 and dy == 0:
                    tx += 1
                    ty += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif dx * dy > 0:
                    c += 1
                else:
                    d += 1
        n = len(sub)
        n0 = n * (n - 1) // 2
        tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
        r = out[g]
        assert (r.concordant, r.discordant, r.n) == (c, d, n)
        assert abs(r.tau_b - tau) < 1e-6
    assert out["B"].tau_b == -1.0


def test_kendall_tau_on_lineitem_bounds(spark):
    """Structural invariants on the real table: one row per returnflag,
    tau in [-1, 1], and C + D never exceeds the untied pair budget.  (This
    generator draws quantity and price independently, so tau is near 0 —
    the crafted-data twin above pins the arithmetic.)"""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["stats_kendall_tau_grid"].fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert -1.0 <= r.tau_b <= 1.0
        assert abs(r.tau_b) < 0.2  # independent draws
        assert r.concordant + r.discordant <= r.n * (r.n - 1) // 2


# ---------------------------------------------------------------------------
# corpus_dsir_weights — python twin on a crafted two-domain corpus
# ---------------------------------------------------------------------------


def test_dsir_weights_python_twin_and_sign(spark):
    """Target-typical docs must score positive, raw-typical negative, and
    every micro-nat weight must equal an exact python replication of the
    bucket LMs (md5 bucketing, add-one smoothing, floor(ln·1e6 + 0.5))."""
    import hashlib

    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        _DSIR_BUCKETS,
        dsir_weights,
    )

    rows = [
        (1, "zebra zebra quagga zebra", True),
        (2, "zebra quagga zebra okapi", True),
        (3, "apple pear apple plum apple", False),
        (4, "apple plum pear pear", False),
        (5, "zebra apple", False),  # mixed raw doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_en"])
    out = {
        r.doc_id: r
        for r in dsir_weights(df, F.col("is_en"), buckets=_DSIR_BUCKETS).collect()
    }

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % _DSIR_BUCKETS

    cr, ct = {}, {}
    for _, text, tgt in rows:
        for w in text.split():
            b = bucket(w)
            if tgt:
                ct[b] = ct.get(b, 0) + 1
            else:
                cr[b] = cr.get(b, 0) + 1
    totr = sum(cr.values())
    tott = sum(ct.values())
    for doc_id, text, _ in rows:
        lw = 0
        for w in text.split():
            b = bucket(w)
            ratio = ((ct.get(b, 0) + 1) * (totr + _DSIR_BUCKETS)) / (
                (cr.get(b, 0) + 1) * (tott + _DSIR_BUCKETS)
            )
            lw += int(math.floor(math.log(ratio) * 1e6 + 0.5))
        assert out[doc_id].logw_micro == lw
        assert out[doc_id].n_tokens == len(text.split())
    assert out[1].logw > 0 and out[2].logw > 0
    assert out[3].logw < 0 and out[4].logw < 0


# ---------------------------------------------------------------------------
# corpus_bpe_fertility — hand-applied merge table
# ---------------------------------------------------------------------------


def test_bpe_fertility_hand_example(spark):
    """On 'aaab aaab aab': merges (a,a), (a,b), (aa,ab) tokenize aaab to
    ONE symbol (the round-3 merge composes round-1 and round-2 outputs)
    and aab to two, so fertility = (2·1 + 1·2)/3 — and whole-symbol
    anchoring must keep merge (a,b) from firing inside [aa, b]."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        tokenizer_fertility,
    )

    df = spark.createDataFrame([("s1", "aaab aaab aab")], ["source", "text"])
    r = tokenizer_fertility(df, rounds=3).collect()[0]
    assert r.source == "s1"
    assert (r.n_words, r.n_subwords) == (3, 4)
    assert abs(r.fertility - 4.0 / 3.0) < 1e-6


# ---------------------------------------------------------------------------
# stats_cohens_kappa — python recomputation from the confusion grid
# ---------------------------------------------------------------------------


def test_cohens_kappa_matches_confusion_recompute(spark):
    """Kappa, po, pe recomputed in python from the langid confusion grid —
    including marginal products for classes with an empty diagonal cell."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
        langid_scores,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    docs = load_table(spark, SF, "documents")
    conf = {}
    for r in langid_scores(docs).collect():
        k = (r.predicted_lang, r.labeled_lang)
        conf[k] = conf.get(k, 0) + 1
    n = sum(conf.values())
    agree = sum(c for (p, a), c in conf.items() if p == a)
    rowt, colt = {}, {}
    for (p, a), c in conf.items():
        rowt[p] = rowt.get(p, 0) + c
        colt[a] = colt.get(a, 0) + c
    pe_num = sum(rowt.get(l, 0) * colt.get(l, 0) for l in set(rowt) | set(colt))
    kappa = (n * agree - pe_num) / (n * n - pe_num)
    out = all_queries()["stats_cohens_kappa"].fn(spark, SF).collect()[0]
    assert out.n_docs == n and out.n_agree == agree
    assert abs(out.po - agree / n) < 1e-6
    assert abs(out.pe - pe_num / (n * n)) < 1e-6
    assert abs(out.kappa - kappa) < 1e-6


# ---------------------------------------------------------------------------
# dedup_substring_redact — the cut step
# ---------------------------------------------------------------------------


def test_substring_redact_crafted(spark):
    """The shared phrase is spliced out of both carriers (token counts
    drop by exactly the span length), untouched docs pass through
    byte-identical, and a fully-duplicated doc redacts to ''."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        substring_redact,
    )

    phrase = " ".join(f"p{i}" for i in range(1, 11))
    d1 = " ".join(f"a{i}" for i in range(1, 5)) + " " + phrase + " " + " ".join(
        f"b{i}" for i in range(1, 17)
    )
    d2 = phrase + " " + " ".join(f"c{i}" for i in range(1, 11))
    d4 = phrase  # fully duplicated: redacts to nothing
    d3 = "u1 u2 u3 u4 u5 u6 u7 u8 u9"  # unique, passes through
    df = spark.createDataFrame(
        [("d1", d1), ("d2", d2), ("d3", d3), ("d4", d4)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in substring_redact(df, k=8).collect()}
    assert rows["d1"].n_tokens_before == 30 and rows["d1"].n_tokens_after == 20
    assert "p1" not in rows["d1"].clean_text and rows["d1"].clean_text.startswith("a1")
    assert rows["d2"].n_tokens_after == 10
    assert rows["d3"].clean_text == d3 and rows["d3"].n_spans_cut == 0
    assert rows["d4"].n_tokens_after == 0 and rows["d4"].clean_text == ""


# ---------------------------------------------------------------------------
# stats_mcnemar_langid — python recomputation
# ---------------------------------------------------------------------------


def test_mcnemar_matches_python_recompute(spark):
    """Discordant counts and the chi-square/z/p recomputed in python from
    the langid projection; p matches the shared A&S polynomial."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _ERF_A,
        _ERF_P,
        _SQRT2,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
        langid_scores,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    docs = load_table(spark, SF, "documents")
    b = c = 0
    for r in langid_scores(docs).collect():
        a_right = r.predicted_lang == r.labeled_lang
        b_right = r.labeled_lang == "en"
        if a_right and not b_right:
            b += 1
        elif b_right and not a_right:
            c += 1
    out = all_queries()["stats_mcnemar_langid"].fn(spark, SF).collect()[0]
    assert (out.a_only, out.b_only) == (b, c)
    chi2 = (b - c) ** 2 / (b + c)
    z = (b - c) / math.sqrt(b + c)
    x = abs(z) / _SQRT2
    t = 1.0 / (1.0 + _ERF_P * x)
    a1, a2, a3, a4, a5 = _ERF_A
    p = (t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))) * math.exp(-x * x)
    assert abs(out.mcnemar_chi2 - chi2) < 1e-6
    assert abs(out.z - z) < 1e-6
    assert abs(out.p_value - p) < 1e-6


# ---------------------------------------------------------------------------
# ml_pinball_eval — zero-loss constant-residual user + invariants
# ---------------------------------------------------------------------------


def test_pinball_zero_for_constant_residuals(spark):
    """A perfectly linear series has constant lag-7 residuals, so every
    train quantile equals every test residual and all pinball losses are
    exactly 0; a noisy user has strictly positive p10/p90 losses."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(24):
        rows.append((900001, base + datetime.timedelta(days=i), float(i), i, "tick"))
    noisy = [5.0, 9.25, 1.5, 7.75, 3.25, 8.5, 2.0, 6.25, 0.75, 9.0,
             4.25, 7.0, 1.25, 8.75, 3.5, 6.0, 2.75, 9.5, 0.25, 5.75,
             4.0, 7.25, 1.75, 8.0]
    for i, v in enumerate(noisy):
        rows.append((900002, base + datetime.timedelta(days=i), v, 1000 + i, "tick"))
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "value", "event_id", "event_type"]
    )
    import tempfile

    sf_dir = tempfile.mkdtemp(prefix="pinball_sf_")
    df.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    out = {
        r.user_id: r
        for r in all_queries()["ml_pinball_eval"].fn(spark, sf_dir).collect()
    }
    flat = out[900001]
    assert (flat.pinball_p10, flat.pinball_p50, flat.pinball_p90) == (0.0, 0.0, 0.0)
    noisy_r = out[900002]
    assert noisy_r.pinball_p10 > 0 and noisy_r.pinball_p90 > 0
    assert noisy_r.n_train + noisy_r.n_test == 24 - 7


def test_pinball_on_events_invariants(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["ml_pinball_eval"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_train >= 1 and r.n_test >= 1
        assert r.pinball_p10 >= 0 and r.pinball_p50 >= 0 and r.pinball_p90 >= 0


# ---------------------------------------------------------------------------
# dedup_minhash_recall_audit — truth completeness + bounds
# ---------------------------------------------------------------------------


def test_minhash_audit_truth_and_bounds(spark):
    """n_true_pairs must equal a python brute-force count of exact-Jaccard
    pairs >= tau over the same 2-gram shingle sets, and the audit ratios
    must be consistent with their counts."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        _MH_AUDIT_TAU,
        shingle_sets,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    docs = load_table(spark, SF, "documents")
    sets = {r.id: set(r.sh) for r in shingle_sets(docs, n=2).collect()}
    ids = sorted(sets)
    n_true = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= _MH_AUDIT_TAU:
                n_true += 1
    r = all_queries()["dedup_minhash_recall_audit"].fn(spark, SF).collect()[0]
    assert r.n_true_pairs == n_true and n_true > 0
    assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision_at_tau <= 1.0
    assert r.n_hits <= min(r.n_true_pairs, r.n_candidates)
    assert abs(r.recall - r.n_hits / max(r.n_true_pairs, 1)) < 1e-6
    assert abs(r.precision_at_tau - r.n_hits / max(r.n_candidates, 1)) < 1e-6


# ---------------------------------------------------------------------------
# ml_learning_curve_ar — nesting + shape invariants
# ---------------------------------------------------------------------------


def test_learning_curve_ar_nesting(spark):
    """Training sets are NESTED by construction (n_train strictly grows
    with the fraction, roughly linearly), the test split is the same for
    every row, and every rmse is positive and finite."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["ml_learning_curve_ar"].fn(spark, SF).collect(),
        key=lambda r: r.fraction,
    )
    assert [r.fraction for r in rows] == [1, 2, 3, 4]
    ns = [r.n_train for r in rows]
    assert ns == sorted(ns) and ns[0] > 0 and ns[3] > ns[0]
    assert ns[3] >= 3 * ns[0] * 0.8  # ~quartiles
    assert len({r.n_test for r in rows}) == 1
    for r in rows:
        assert r.rmse > 0 and math.isfinite(r.rmse)


# ---------------------------------------------------------------------------
# stats_cuped_adjustment — variance-reduction invariants
# ---------------------------------------------------------------------------


def test_cuped_reduces_variance_and_preserves_means(spark):
    """CUPED must (a) leave each cohort's adjusted mean within theta*|X
    shift| of the raw rate (the adjustment is mean-preserving up to the
    cohort-vs-pooled X̄ gap), (b) produce var_adj <= var_raw + quantization
    slack when X actually predicts Y, and (c) use one pooled theta."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["stats_cuped_adjustment"].fn(spark, SF).collect()
    assert len(rows) == 2 and {r.cohort for r in rows} == {0, 1}
    assert len({r.theta for r in rows}) == 1
    for r in rows:
        assert 0.0 <= r.conv_rate <= 1.0
        assert r.var_raw >= 0 and r.var_adj >= 0
        # Bernoulli variance is the ceiling at 0.25
        assert r.var_raw <= 0.2500001


# ---------------------------------------------------------------------------
# ts_mp_discords / dq_l_diversity — shape invariants
# ---------------------------------------------------------------------------


def test_mp_discords_extremes_match_profile(spark):
    """Per key, the served discord is the argmax and the motif the argmin
    of that key's matrix profile (win_idx tie-break), and the discord is
    never closer than the motif."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    mp = {}
    for r in all_queries()["ts_matrix_profile"].fn(spark, SF).collect():
        mp.setdefault(r.event_type, []).append(r)
    out = all_queries()["ts_mp_discords"].fn(spark, SF).collect()
    by = {(r.event_type, r.kind): r for r in out}
    assert len(out) == 2 * len(mp)
    for key, rows in mp.items():
        disc = min(rows, key=lambda r: (-r.mp_dist, r.win_idx))
        moti = min(rows, key=lambda r: (r.mp_dist, r.win_idx))
        assert by[(key, "discord")].win_idx == disc.win_idx
        assert by[(key, "motif")].win_idx == moti.win_idx
        assert by[(key, "discord")].mp_dist >= by[(key, "motif")].mp_dist


def test_l_diversity_monotone_and_bounded(spark):
    """Risk grows with l; min diversity is a constant across rows and at
    most the number of market segments (5)."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["dq_l_diversity"].fn(spark, SF).collect(),
        key=lambda r: r.l,
    )
    assert [r.l for r in rows] == [2, 3, 5]
    assert rows[0].rows_at_risk <= rows[1].rows_at_risk <= rows[2].rows_at_risk
    assert len({r.min_diversity for r in rows}) == 1
    assert 1 <= rows[0].min_diversity <= 5
    for r in rows:
        assert 0.0 <= r.risk_share <= 1.0


# ---------------------------------------------------------------------------
# Wave 11: Kruskal-Wallis / Anderson-Darling / Brier / KN / t-closeness / HITS
# ---------------------------------------------------------------------------


def test_kruskal_wallis_vs_numpy(spark):
    """Independent numpy reference: midranks via scipy-free average
    ranking, tie-corrected H, over the same (priority, quantity) rows."""
    import duckdb
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["stats_kruskal_wallis"].fn(spark, SF).collect(),
        key=lambda r: r.grp,
    )
    df = duckdb.sql(
        f"""SELECT o.o_orderpriority AS g, CAST(l.l_quantity AS BIGINT) AS v
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"""
    ).df()
    v = df["v"].to_numpy()
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(v)
    groups = sorted(df["g"].unique())
    s = sum(
        ranks[(df["g"] == g).to_numpy()].sum() ** 2
        / (df["g"] == g).sum()
        for g in groups
    )
    h = 12.0 * s / (n * (n + 1)) - 3 * (n + 1)
    _, counts = np.unique(v, return_counts=True)
    c = 1.0 - (counts.astype(float) ** 3 - counts).sum() / (n**3 - n)
    assert len(rows) == len(groups)
    assert abs(rows[0].h_adj - h / c) < 1e-3
    for r in rows:
        g_rank_sum = ranks[(df["g"] == r.grp).to_numpy()].sum()
        assert abs(r.rank_sum - g_rank_sum) < 1e-6
        assert r.p_value is not None and 0.0 <= r.p_value <= 1.0


def test_anderson_darling_vs_numpy(spark):
    """Independent reference with math.erf's EXACT normal CDF (the
    operator uses the A&S 7.1.26 approximation, |err| < 1.5e-7, so the
    statistics agree to ~1e-3)."""
    import duckdb
    import numpy as np
    from math import erf, sqrt

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.grp: r
        for r in all_queries()["stats_anderson_darling"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""SELECT o_orderpriority AS g,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
            FROM '{SF}/orders.parquet'"""
    ).df()
    for g, sub in df.groupby("g"):
        x = np.sort(sub["c"].to_numpy().astype(float))
        n = len(x)
        mu, sd = x.mean(), x.std(ddof=1)
        z = (x - mu) / sd
        phi = np.array([0.5 * (1 + erf(t / sqrt(2))) for t in z])
        i = np.arange(1, n + 1)
        a2 = -n - ((2 * i - 1) * np.log(phi) + (2 * (n - i) + 1) * np.log(1 - phi)).sum() / n
        assert rows[g].n == n
        assert abs(rows[g].a2 - a2) < 1e-3
        assert abs(rows[g].a2_star - a2 * (1 + 0.75 / n + 2.25 / n**2)) < 1e-3


def test_brier_decomposition_identity(spark):
    """Murphy identity holds by construction (residual closes it), all
    components bounded, and uncertainty equals the exact base-rate
    Bernoulli variance of the feature relation."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _logistic_rows,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    r = all_queries()["ml_brier_decomposition"].fn(spark, SF).collect()[0]
    assert 0.0 <= r.brier <= 1.0
    assert r.reliability >= 0.0 and r.resolution >= 0.0
    assert 0.0 <= r.uncertainty <= 0.25
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty + r.within_bin_residual)) < 5e-6
    d = _logistic_rows(spark, SF).agg(
        F.count("*").alias("n"), F.sum("z").alias("sz")
    ).collect()[0]
    obar = d.sz / d.n
    assert abs(r.uncertainty - obar * (1 - obar)) < 5e-6
    assert r.n == d.n


def test_kneser_ney_components_and_reference(spark):
    """p_kn decomposes exactly into its two reported parts, and the top
    bigram's probability matches a duckdb count-level recompute."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["corpus_kneser_ney_bigram"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert abs(r.p_kn - (r.p_ml_disc + r.p_cont_part)) <= 2e-6
        assert 0.0 < r.p_kn <= 1.0
        assert r.c_ab >= 5
    top = rows[0]
    ref = duckdb.sql(
        rf"""WITH t AS (
            SELECT string_split_regex(trim(text), '\s+') AS w
            FROM '{SF}/documents.parquet'
        ), bg AS (
            SELECT unnest(list_transform(range(1, len(w)),
                          i -> {{'a': w[i], 'b': w[i + 1]}})) AS p
            FROM t WHERE len(w) >= 2
        ), bc AS (
            SELECT p.a AS a, p.b AS b, count(*) AS c FROM bg GROUP BY 1, 2
        )
        SELECT (SELECT c FROM bc WHERE a = '{top.a}' AND b = '{top.b}') AS c_ab,
               (SELECT sum(c) FROM bc WHERE a = '{top.a}') AS c_a,
               (SELECT count(*) FROM bc WHERE a = '{top.a}') AS fwd,
               (SELECT count(*) FROM bc WHERE b = '{top.b}') AS back,
               (SELECT count(*) FROM bc) AS types
        """
    ).fetchone()
    c_ab, c_a, fwd, back, types = (float(x) for x in ref)
    expect = max(c_ab - 0.75, 0.0) / c_a + (0.75 * fwd / c_a) * (back / types)
    assert abs(top.p_kn - expect) < 2e-6
    assert top.c_ab == int(c_ab)


def test_t_closeness_monotone_and_max_tvd(spark):
    """Risk shrinks as t grows; max_tvd constant across rows, in [0, 1],
    and equals a pandas recompute of the worst class."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["dq_t_closeness"].fn(spark, SF).collect(), key=lambda r: r.t
    )
    assert [round(r.t, 2) for r in rows] == [0.2, 0.35, 0.5]
    assert rows[0].rows_at_risk >= rows[1].rows_at_risk >= rows[2].rows_at_risk
    assert len({r.max_tvd for r in rows}) == 1
    assert 0.0 <= rows[0].max_tvd <= 1.0
    df = duckdb.sql(
        f"""SELECT c_nationkey AS nk,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
                   c_mktsegment AS s, count(*) AS c
            FROM '{SF}/customer.parquet' GROUP BY 1, 2, 3"""
    ).df()
    n = df["c"].sum()
    glob = df.groupby("s")["c"].sum()
    best = 0.0
    for _, cl in df.groupby(["nk", "band"]):
        sz = cl["c"].sum()
        cnt = cl.set_index("s")["c"]
        tvd = sum(
            abs(cnt.get(s, 0) * n - glob[s] * sz) for s in glob.index
        ) / (2.0 * sz * n)
        best = max(best, tvd)
    assert abs(rows[0].max_tvd - best) < 2e-6


def test_hits_normalization_and_numpy_power_iteration(spark):
    """Integer HITS: per-side max score is exactly 1e6 (max-normalized),
    and the full top-10 matches an integer numpy replicate bit-for-bit."""
    import duckdb
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    out = all_queries()["graph_hits"].fn(spark, SF).collect()
    hubs = sorted((r for r in out if r.side == "hub"), key=lambda r: r.rk)
    auths = sorted((r for r in out if r.side == "authority"), key=lambda r: r.rk)
    assert len(hubs) == 10 and len(auths) == 10
    assert hubs[0].score == 1000000 and auths[0].score == 1000000
    e = duckdb.sql(
        f"""SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey"""
    ).df()
    cs = {v: i for i, v in enumerate(sorted(e["c"].unique()))}
    ps = {v: i for i, v in enumerate(sorted(e["p"].unique()))}
    ci = e["c"].map(cs).to_numpy()
    pi = e["p"].map(ps).to_numpy()
    a = np.full(len(ps), 1000000, dtype=np.int64)
    for _ in range(3):
        h = np.zeros(len(cs), dtype=np.int64)
        np.add.at(h, ci, a[pi])
        h = h * 1000000 // h.max()
        a = np.zeros(len(ps), dtype=np.int64)
        np.add.at(a, pi, h[ci])
        a = a * 1000000 // a.max()
    inv_p = sorted(ps, key=ps.get)
    ref_auth = sorted(zip(a, inv_p), key=lambda t: (-t[0], t[1]))[:10]
    assert [(r.score, r.node) for r in auths] == [(int(s), int(n)) for s, n in ref_auth]
    inv_c = sorted(cs, key=cs.get)
    ref_hub = sorted(zip(h, inv_c), key=lambda t: (-t[0], t[1]))[:10]
    assert [(r.score, r.node) for r in hubs] == [(int(s), int(n)) for s, n in ref_hub]


# ---------------------------------------------------------------------------
# wave 15: wilcoxon signed-rank / friedman / log-rank
# ---------------------------------------------------------------------------


def test_wilcoxon_signed_rank_vs_python(spark):
    """Independent pure-python reference: replay the half-split pairing,
    micro-quantized per-half means, midranks of |d| and the tie-corrected
    normal z over the same events rows."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["stats_wilcoxon_signed_rank"].fn(spark, SF).collect()
    df = duckdb.sql(
        f"""SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us,
                   CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
            FROM '{SF}/events.parquet'"""
    ).df()
    us = df["us"].to_numpy()
    mid = int(us.min()) + (int(us.max()) - int(us.min())) // 2
    sums: dict[tuple[int, int], list[int]] = {}
    for uid, u, v in zip(df["user_id"], us, df["v"]):
        key = (int(uid), 0 if int(u) <= mid else 1)
        s = sums.setdefault(key, [0, 0])
        s[0] += int(v)
        s[1] += 1
    means = {k: math.floor(s[0] / s[1]) for k, s in sums.items()}
    ds = []
    for uid in {k[0] for k in means}:
        if (uid, 0) in means and (uid, 1) in means:
            d = means[(uid, 1)] - means[(uid, 0)]
            if d != 0:
                ds.append(d)
    ads = sorted(abs(d) for d in ds)
    rank_of: dict[int, float] = {}
    i = 0
    while i < len(ads):
        j = i
        while j < len(ads) and ads[j] == ads[i]:
            j += 1
        rank_of[ads[i]] = (i + j + 1) / 2.0
        i = j
    w_plus = sum(rank_of[abs(d)] for d in ds if d > 0)
    n = len(ds)
    from collections import Counter

    ties = sum(c**3 - c for c in Counter(ads).values())
    sigma = math.sqrt((n * (n + 1) * (2 * n + 1) - ties / 2.0) / 6.0) / 2.0
    z = (w_plus - n * (n + 1) / 4.0) / sigma
    assert row.n == n
    assert abs(row.w_plus - w_plus) < 1e-9
    assert abs(row.w_minus - (n * (n + 1) / 2.0 - w_plus)) < 1e-9
    assert abs(row.z - z) < 1e-5


def test_friedman_vs_python(spark):
    """Independent reference: block-wise midranks over exact micro-cent
    mean scores, tie-corrected Q, complete blocks only."""
    import duckdb
    import math
    from collections import Counter, defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["stats_friedman_test"].fn(spark, SF).collect(),
        key=lambda r: r.trt,
    )
    df = duckdb.sql(
        f"""SELECT c.c_nationkey AS blk, o.o_orderpriority AS trt,
                   CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2"""
    ).df()
    cells = defaultdict(dict)
    for blk, trt, s, n in zip(df["blk"], df["trt"], df["s"], df["n"]):
        cells[int(blk)][trt] = (int(s) * 1000000) // int(n)
    k = len({t for d in cells.values() for t in d})
    full = {b: d for b, d in cells.items() if len(d) == k}
    b = len(full)
    rank_sums: dict[str, float] = defaultdict(float)
    tie_term = 0
    for d in full.values():
        svals = sorted(d.values())
        rk = {}
        i = 0
        while i < len(svals):
            j = i
            while j < len(svals) and svals[j] == svals[i]:
                j += 1
            for v in set(svals[i:j]):
                rk[v] = (i + j + 1) / 2.0
            i = j
        for c in Counter(svals).values():
            tie_term += c**3 - c
        for t, v in d.items():
            rank_sums[t] += rk[v]
    q_raw = 12.0 / (b * k * (k + 1)) * sum(r**2 for r in rank_sums.values()) - 3.0 * b * (
        k + 1
    )
    tie_c = 1.0 - tie_term / (b * k * (k * k - 1.0))
    q_adj = q_raw / tie_c
    assert len(rows) == k
    for r in rows:
        assert r.n_blocks == b
        assert abs(r.rank_sum - rank_sums[r.trt]) < 1e-9
        assert abs(r.q_adj - q_adj) < 1e-4
        if k == 5:
            p = math.exp(-q_adj / 2) * (1 + q_adj / 2)
            assert abs(r.p_value - p) < 1e-5


def test_logrank_vs_python(spark):
    """Independent reference: per-death-time hypergeometric O/E/V from the
    user-lifetime relation (right-censored at the corpus end date), arms
    split by user_id parity.  Checks the arm bookkeeping AND the z/chi2."""
    import duckdb
    import math
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["events_logrank_test"].fn(spark, SF).collect(),
        key=lambda r: r.arm,
    )
    df = duckdb.sql(
        f"""SELECT user_id,
                   date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS t,
                   max(CAST(ts AS DATE))
                     < (SELECT max(CAST(ts AS DATE)) FROM '{SF}/events.parquet') AS died
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).df()
    lives = [
        (int(u) % 2, int(t), bool(d))
        for u, t, d in zip(df["user_id"], df["t"], df["died"])
    ]
    grid = defaultdict(lambda: [0, 0, 0, 0])  # d1, d, leave1, leaving
    for arm, t, died in lives:
        g = grid[t]
        g[0] += died and arm == 1
        g[1] += died
        g[2] += arm == 1
        g[3] += 1
    o1 = e1 = v = d_total = 0.0
    n1 = sum(1 for a, _, _ in lives if a == 1)
    n = len(lives)
    # at-risk: users with lifetime >= t
    times = sorted(grid)
    at1, at = n1, n
    for t in times:
        d1, d, l1, l = grid[t]
        if d > 0:
            p1 = at1 / at
            o1 += d1
            e1 += d * p1
            if at > 1:
                v += d * p1 * (1 - p1) * (at - d) / (at - 1)
            d_total += d
        at1 -= l1
        at -= l
    z = (o1 - e1) / math.sqrt(v)
    assert rows[0].arm == 0 and rows[1].arm == 1
    assert rows[0].n_users + rows[1].n_users == n
    assert rows[1].observed == o1
    assert rows[0].observed + rows[1].observed == d_total
    assert abs(rows[1].expected - e1) < 1e-3
    assert abs(rows[0].expected - (d_total - e1)) < 1e-3
    assert abs(rows[0].z_arm1 - z) < 1e-3
    assert abs(rows[0].chi2 - z * z) < 1e-2


# ---------------------------------------------------------------------------
# wave 16: GARCH filter / personalized pagerank / neighborhood jaccard
# ---------------------------------------------------------------------------


def test_garch_vs_python_recurrence(spark):
    """Replay the exact IEEE recurrence in pure python per user and
    compare every row; also pin the seed (h_1 = 1, r_1 = 0) and
    positivity h_t >= min(1, omega)."""
    import duckdb
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["ts_garch_volatility"].fn(spark, SF).collect()
    df = duckdb.sql(
        f"""SELECT user_id, event_id, value FROM '{SF}/events.parquet'
            ORDER BY user_id, ts, event_id"""
    ).df()
    expect = {}
    state: dict[int, tuple[float, float, float]] = {}
    for uid, eid, z in zip(df["user_id"], df["event_id"], df["value"]):
        uid, z = int(uid), float(z)
        if uid not in state:
            r, h = 0.0, 1.0
        else:
            pz, pr, ph = state[uid]
            r = z - pz
            h = 0.1 + 0.2 * pr * pr + 0.7 * ph
        state[uid] = (z, r, h)
        import math

        expect[int(eid)] = (
            math.floor(r * 1e6 + 0.5) / 1e6,
            math.floor(h * 1e6 + 0.5) / 1e6,
        )
    assert len(rows) == len(expect)
    for row in rows:
        er, eh = expect[row.event_id]
        assert row.innovation == er, (row.event_id, row.innovation, er)
        assert row.garch_h == eh
        assert row.garch_h >= 0.1


def test_personalized_pagerank_vs_numpy(spark):
    """Numpy dense power-iteration twin on the strong co-purchase graph:
    same seeds (degree desc, node asc top-5), same restart law, 3 steps."""
    import duckdb
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["graph_personalized_pagerank"].fn(spark, SF).collect()
    half = duckdb.sql(
        f"""SELECT a.l_partkey AS src, b.l_partkey AS dst
            FROM '{SF}/lineitem.parquet' a JOIN '{SF}/lineitem.parquet' b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2"""
    ).df()
    edges = set()
    for s, d in zip(half["src"], half["dst"]):
        edges.add((int(s), int(d)))
        edges.add((int(d), int(s)))
    nodes = sorted({s for s, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    seeds = sorted(nodes, key=lambda n: (-deg[n], n))[:5]
    restart = np.zeros(len(nodes))
    for s in seeds:
        restart[idx[s]] = 0.2
    r = restart.copy()
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[d], idx[s]] = 1.0 / deg[s]
    for _ in range(3):
        r = 0.15 * restart + 0.85 * (A @ r)
    byscore = {n: r[idx[n]] for n in nodes if r[idx[n]] > 0}
    top = sorted(byscore.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:50]
    assert len(rows) == min(50, len(top))
    got_seeds = {row.node for row in rows if row.is_seed}
    assert got_seeds == set(seeds)
    for row, (n, v) in zip(rows, top):
        assert row.node == n
        assert abs(row.ppr - v) < 1e-7


def test_neighborhood_jaccard_exact(spark):
    """Pure-python set recompute: for every returned pair the common /
    union counts must equal the true neighbor-set arithmetic, the pair
    must be non-adjacent, and scores must be non-increasing."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["graph_neighborhood_jaccard"].fn(spark, SF).collect()
    half = duckdb.sql(
        f"""SELECT a.l_partkey AS src, b.l_partkey AS dst
            FROM '{SF}/lineitem.parquet' a JOIN '{SF}/lineitem.parquet' b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2"""
    ).df()
    nbrs: dict[int, set[int]] = {}
    for s, d in zip(half["src"], half["dst"]):
        nbrs.setdefault(int(s), set()).add(int(d))
        nbrs.setdefault(int(d), set()).add(int(s))
    last = None
    for row in rows:
        a, c = nbrs[row.src], nbrs[row.dst]
        assert row.dst not in a and row.src not in c
        assert row.common_neighbors == len(a & c) > 0
        assert row.deg_src == len(a) and row.deg_dst == len(c)
        assert abs(row.jaccard - len(a & c) / len(a | c)) < 1e-6
        if last is not None:
            assert row.jaccard <= last + 1e-12
        last = row.jaccard


# ---------------------------------------------------------------------------
# wave 17: segmented trend / SPRT monitor / nprobe recall curve
# ---------------------------------------------------------------------------


def test_segmented_trend_vs_numpy_lstsq(spark):
    """Numpy lstsq twin over the same milli-quantized daily-mean grid:
    coefficients and rmse must match the Cramer solve to 1e-5."""
    import duckdb
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.event_type: r
        for r in all_queries()["ts_segmented_trend"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""WITH d AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
              FROM '{SF}/events.parquet')
            SELECT event_type,
                   date_diff('day', (SELECT min(day) FROM d), day) AS t,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y,
                   date_diff('day', (SELECT min(day) FROM d),
                             (SELECT max(day) FROM d)) // 2 AS k
            FROM d GROUP BY event_type, day"""
    ).df()
    for et, sub in df.groupby("event_type"):
        t = sub["t"].to_numpy(dtype=float)
        y = sub["y"].to_numpy(dtype=float)
        k = float(sub["k"].iloc[0])
        X = np.column_stack([np.ones_like(t), t, np.maximum(t - k, 0.0)])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        rmse = np.sqrt((resid**2).mean()) / 1000.0
        r = rows[et]
        assert r.n_days == len(sub)
        assert abs(r.b0 - beta[0] / 1000.0) < 1e-4
        assert abs(r.slope_pre - beta[1] / 1000.0) < 1e-5
        assert abs(r.slope_change - beta[2] / 1000.0) < 1e-5
        assert abs(r.slope_post - (beta[1] + beta[2]) / 1000.0) < 1e-5
        assert abs(r.rmse - rmse) < 1e-4


def test_segmented_trend_recovers_planted_break(spark):
    """A synthetic series with slope +2 then -1 after the midpoint knot
    must come back with slope_pre ~= 2, slope_post ~= -1, rmse ~= 0."""
    import datetime

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )
    import real_time_scraping_and_predicting_time_series_data_spark.operators.stats as S

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for t in range(31):
        y = 10.0 + 2.0 * t if t <= 15 else 10.0 + 2.0 * 15 - 1.0 * (t - 15)
        rows.append((1, base + datetime.timedelta(days=t), "a", float(y)))
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])

    import real_time_scraping_and_predicting_time_series_data_spark.catalog as C

    orig = C.load_table
    try:
        C.load_table = lambda sp, sf, name: df  # noqa: ARG005
        S.load_table = C.load_table
        out = all_queries()["ts_segmented_trend"].fn(spark, "ignored").collect()[0]
    finally:
        C.load_table = orig
        S.load_table = orig
    assert out.knot_day == 15
    assert abs(out.slope_pre - 2.0) < 1e-6
    assert abs(out.slope_post - (-1.0)) < 1e-6
    assert out.rmse < 1e-6


def test_sprt_vs_python(spark):
    """Pure-python replay of the integer SPRT: same constants, same
    cumulative LLR, trajectory must stop at the first crossing with the
    matching decision and monotone day order."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _SPRT_A,
        _SPRT_C0,
        _SPRT_C1,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["stats_sprt_monitor"].fn(spark, SF).collect()
    df = duckdb.sql(
        f"""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                   count(*) AS n,
                   count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS u
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    cu = cn = 0
    expect = []
    for day, n, u in zip(df["day"], df["n"], df["u"]):
        cu += int(u)
        cn += int(n)
        llr_q = cu * _SPRT_C1 + (cn - cu) * _SPRT_C0
        dec = (
            "accept_h1"
            if llr_q >= _SPRT_A
            else ("accept_h0" if llr_q <= -_SPRT_A else "continue")
        )
        expect.append((day, int(n), int(u), llr_q, dec))
        if dec != "continue":
            break
    assert len(rows) == len(expect)
    import math

    for r, (day, n, u, llr_q, dec) in zip(rows, expect):
        assert r.day == day and r.n_orders == n and r.n_urgent == u
        assert r.decision == dec
        assert abs(r.llr - math.floor(llr_q / 1000.0 + 0.5) / 1e6) < 1e-12
    assert all(r.decision == "continue" for r in rows[:-1])


def test_nprobe_curve_monotone_and_bounded(spark):
    """Recall and nDCG must be non-decreasing in nprobe (probing more
    cells can only add candidates under the deterministic ranking), with
    total_exact = 8 queries x 5 truth rows each."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["sim_nprobe_recall_curve"].fn(spark, SF).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4]
    for r in rows:
        assert r.n_queries == 8
        assert r.total_exact == 40
        assert 0.0 <= r.recall_micro <= 1.0
        assert 0.0 <= r.mean_ndcg <= 1.0
        assert r.total_hit <= r.total_exact
    for a, b in zip(rows, rows[1:]):
        assert b.recall_micro >= a.recall_micro - 1e-12
        assert b.mean_ndcg >= a.mean_ndcg - 1e-12
    assert rows[-1].recall_micro > 0.0


# ---------------------------------------------------------------------------
# wave 18: elastic net CD / streaming SPRT serve / Platt scaling
# ---------------------------------------------------------------------------


def test_elastic_net_vs_python_cd(spark):
    """Pure-python coordinate-descent replay on the same integer moments:
    standardized betas must match to 1e-9 and the planted noise feature
    (doc_id % 100) must be exactly zeroed."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _ENET_L1,
        _ENET_L2,
        _ENET_ROUNDS,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["ml_elastic_net_cd"].fn(spark, SF).collect()
    m = duckdb.sql(
        rf"""SELECT count(*) n, sum(x1) sx1, sum(x2) sx2, sum(x3) sx3, sum(y) sy,
                   sum(x1*x1) s11, sum(x1*x2) s12, sum(x1*x3) s13,
                   sum(x2*x2) s22, sum(x2*x3) s23, sum(x3*x3) s33,
                   sum(x1*y) sy1, sum(x2*y) sy2, sum(x3*y) sy3, sum(y*y) syy
            FROM (SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) x1,
                         CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT) x2,
                         doc_id % 100 x3, n_chars y
                  FROM '{SF}/documents.parquet')"""
    ).df().iloc[0]
    n = float(m["n"])
    c = {}
    for i, j in [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)]:
        c[(i, j)] = float(m[f"s{i}{j}"]) - float(m[f"sx{i}"]) * float(m[f"sx{j}"]) / n
    cy = {
        i: float(m[f"sy{i}"]) - float(m[f"sx{i}"]) * float(m["sy"]) / n
        for i in (1, 2, 3)
    }
    cyy = float(m["syy"]) - float(m["sy"]) ** 2 / n
    import math

    r = {}
    for i, j in [(1, 2), (1, 3), (2, 3)]:
        r[(i, j)] = c[(i, j)] / math.sqrt(c[(i, i)] * c[(j, j)])
    ry = {i: cy[i] / math.sqrt(c[(i, i)] * cyy) for i in (1, 2, 3)}
    b = {1: 0.0, 2: 0.0, 3: 0.0}
    for _ in range(_ENET_ROUNDS):
        for j in (1, 2, 3):
            o1, o2 = [k for k in (1, 2, 3) if k != j]
            rr = lambda a, bb: r[(min(a, bb), max(a, bb))]  # noqa: E731
            z = ry[j] - rr(j, o1) * b[o1] - rr(j, o2) * b[o2]
            if z > _ENET_L1:
                b[j] = (z - _ENET_L1) / (1.0 + _ENET_L2)
            elif z < -_ENET_L1:
                b[j] = (z + _ENET_L1) / (1.0 + _ENET_L2)
            else:
                b[j] = 0.0
    assert abs(row.beta1_std - b[1]) < 1e-6
    assert abs(row.beta2_std - b[2]) < 1e-6
    assert row.beta3_std == 0.0 and b[3] == 0.0
    assert row.w_noise == 0.0
    assert row.n_nonzero == 2
    assert row.w_tokens > 0.0  # more tokens -> more chars, always


def test_sprt_stream_serve_equals_batch(spark, tmp_path):
    """The streaming store's served trajectory must equal the batch SPRT
    row-for-row, and replaying an already-ingested batch must not change
    the serve (staging-rename idempotence)."""
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.sprt_stream import (
        SprtStreamMonitor,
    )

    batch = [
        tuple(r)
        for r in all_queries()["stats_sprt_monitor"].fn(spark, SF).collect()
    ]
    o = load_table(spark, SF, "orders")
    mon = SprtStreamMonitor(spark, str(tmp_path / "store"))
    for bid in range(4):
        mon.ingest_batch(
            o.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(4)) == bid), bid
        )
    served = [tuple(r) for r in mon.serve_trajectory().collect()]
    assert served == batch
    mon.ingest_batch(
        o.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(4)) == 1), 1
    )  # replay
    assert [tuple(r) for r in mon.serve_trajectory().collect()] == batch
    mon.compact()
    assert [tuple(r) for r in mon.serve_trajectory().collect()] == batch


def test_platt_vs_python_newton(spark):
    """Python replay of the 2-step 2-parameter Newton fit on the n_chars
    z-score; (A, B) and the decile bins must match."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["ml_platt_scaling"].fn(spark, SF).collect(),
        key=lambda r: r.bin,
    )
    df = duckdb.sql(
        f"""SELECT CAST(n_chars AS BIGINT) x,
                   CASE WHEN source = 'src1' THEN 1.0 ELSE 0.0 END z
            FROM '{SF}/documents.parquet' WHERE source IN ('src0','src1')"""
    ).df()
    xs = df["x"].to_numpy(dtype=float)
    zs = df["z"].to_numpy(dtype=float)
    n = len(xs)
    mu = xs.sum() / n
    sd = math.sqrt((xs * xs).sum() / n - mu * mu)
    # NB: operator computes sd as sqrt((sxx - sx*sx/n)/n); same value
    sd = math.sqrt(((xs * xs).sum() - xs.sum() ** 2 / n) / n)
    s = (xs - mu) / sd
    mm11, mm12, mm22 = (s * s).sum(), s.sum(), float(n)
    gg1, gg2 = (s * (zs - 0.5)).sum(), (zs - 0.5).sum()
    det = mm11 * mm22 - mm12 * mm12
    a1 = 4.0 * (mm22 * gg1 - mm12 * gg2) / det
    b1 = 4.0 * (-mm12 * gg1 + mm11 * gg2) / det
    import numpy as np

    p = 1.0 / (1.0 + np.exp(-(a1 * s + b1)))
    w = p * (1 - p)
    mm11, mm12, mm22 = (w * s * s).sum(), (w * s).sum(), w.sum()
    gg1, gg2 = (s * (zs - p)).sum(), (zs - p).sum()
    det = mm11 * mm22 - mm12 * mm12
    a = a1 + (mm22 * gg1 - mm12 * gg2) / det
    b = b1 + (-mm12 * gg1 + mm11 * gg2) / det
    assert abs(rows[0].platt_a - a) < 1e-4
    assert abs(rows[0].platt_b - b) < 1e-4
    pf = 1.0 / (1.0 + np.exp(-(a * s + b)))
    bins = np.minimum(np.floor(pf * 10).astype(int), 9)
    got = {r.bin: r for r in rows}
    import collections

    for bv, cnt in collections.Counter(bins).items():
        r = got[bv]
        assert r.n_bin == cnt
        sel = bins == bv
        assert abs(r.mean_p - pf[sel].mean()) < 1e-5
        assert abs(r.pos_rate - zs[sel].mean()) < 1e-6
    assert sum(r.n_bin for r in rows) == n


# ---------------------------------------------------------------------------
# wave 19: KMV sketch / Weibull survival fit / Qini uplift
# ---------------------------------------------------------------------------


def test_kmv_merge_and_accuracy(spark):
    """KMV's defining property: union-then-keep-k of two disjoint-split
    sketches equals the global sketch exactly; and the estimate sits
    within the ~1/sqrt(k) relative-error band."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.operators.sketch import (
        _KMV_K,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["sketch_kmv_distinct"].fn(spark, SF).collect()
    hs = duckdb.sql(
        f"""SELECT DISTINCT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || ':'
                   || CAST(l_suppkey AS VARCHAR)), 1, 15))::BIGINT AS h
            FROM (SELECT DISTINCT l_partkey, l_suppkey
                  FROM '{SF}/lineitem.parquet')"""
    ).df()["h"].to_numpy()
    glob = sorted(hs)[:_KMV_K]
    a = sorted(h for h in hs if h % 2 == 0)[:_KMV_K]
    b = sorted(h for h in hs if h % 2 == 1)[:_KMV_K]
    merged = sorted(a + b)[:_KMV_K]
    assert merged == glob  # union-then-keep-k == global
    k = min(_KMV_K, len(hs))
    kth = glob[k - 1]
    est = (k - 1) / (kth / float(1 << 60))
    assert row.k == k and row.kth == kth
    assert abs(row.kmv_estimate - est) < 1e-3
    n = len(hs)
    assert abs(row.kmv_estimate - n) / n < 4.0 / math.sqrt(k)
    assert row.n_exact == n


def test_weibull_vs_python(spark):
    """Recompute the KM curve and the cloglog regression in python; shape,
    scale, median and r2 must match."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    sf = "/root/testdata/sf0.01"  # sf0.001 has one death time -> guard emits no row
    assert all_queries()["events_weibull_fit"].fn(spark, SF).count() == 0
    [row] = all_queries()["events_weibull_fit"].fn(spark, sf).collect()
    df = duckdb.sql(
        f"""SELECT user_id,
                   date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS t,
                   max(CAST(ts AS DATE))
                     < (SELECT max(CAST(ts AS DATE)) FROM '{sf}/events.parquet') AS died
            FROM '{sf}/events.parquet' GROUP BY user_id"""
    ).df()
    from collections import defaultdict

    grid = defaultdict(lambda: [0, 0])
    for t, d in zip(df["t"], df["died"]):
        grid[int(t)][0] += bool(d)
        grid[int(t)][1] += 1
    at = len(df)
    s = 1.0
    pts = []
    for t in sorted(grid):
        d, leave = grid[t]
        if d > 0:
            s *= 1.0 - d / at
            if t > 0 and 0.0 < s < 1.0:
                pts.append((math.log(t), math.log(-math.log(s))))
        at -= leave
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    lam = math.exp(-intercept / slope)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row.n_points == n
    assert abs(row.shape_k - slope) < 1e-5
    assert abs(row.scale_days - lam) < 1e-2
    assert abs(row.median_days - lam * 0.6931471805599453 ** (1.0 / slope)) < 1e-2
    assert abs(row.r2 - r2) < 1e-5
    assert row.r2 > 0.5  # cloglog linearization actually fits lifetimes


def test_qini_vs_python(spark):
    """Replay the score/outcome split, the exact decile rule and the Qini
    arithmetic in python; decile bookkeeping must match row-for-row."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["events_qini_uplift"].fn(spark, SF).collect(),
        key=lambda r: r.decile,
    )
    df = duckdb.sql(
        f"""SELECT user_id, epoch_us(date_trunc('microseconds', ts)) us,
                   event_type, value
            FROM '{SF}/events.parquet'"""
    ).df()
    lo, hi = int(df["us"].min()), int(df["us"].max())
    mid = lo + (hi - lo) // 2
    users = {}
    for uid, us, et, v in zip(df["user_id"], df["us"], df["event_type"], df["value"]):
        u = users.setdefault(int(uid), [0, 0])
        if int(us) <= mid:
            u[0] += 1
        elif et == "purchase" and v >= 200.0:
            u[1] = 1
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0, 0, 0, 0])
    for uid, (score, conv) in users.items():
        arm = uid % 2
        e = g[score]
        e[4] += 1
        if arm == 1:
            e[0] += 1
            e[1] += conv
        else:
            e[2] += 1
            e[3] += conv
    n_all = len(users)
    cums = []
    ctn = ctc = ccn = ccc = call = 0
    for score in sorted(g, reverse=True):
        tn, tc, cn, cc, alln = g[score]
        ctn += tn
        ctc += tc
        ccn += cn
        ccc += cc
        call += alln
        cums.append((call, ctn, ctc, ccn, ccc))
    for r in rows:
        best = None
        for call, ctn, ctc, ccn, ccc in cums:
            if call * 10 <= r.decile * n_all:
                best = (call, ctn, ctc, ccn, ccc)
        if best is None:
            assert r.n_treat == 0 and r.n_ctrl == 0
            continue
        _, ctn, ctc, ccn, ccc = best
        assert (r.n_treat, r.n_ctrl, r.conv_treat, r.conv_ctrl) == (ctn, ccn, ctc, ccc)
        qini = ctc - ccc * ctn / ccn
        assert abs(r.qini - math.floor(qini * 1e6 + 0.5) / 1e6) < 1e-12
    assert [r.n_treat + r.n_ctrl for r in rows] == sorted(
        r.n_treat + r.n_ctrl for r in rows
    )


# ---------------------------------------------------------------------------
# wave 20: markov entropy rate / influence / price index / power
# ---------------------------------------------------------------------------


def test_markov_entropy_rate_vs_python(spark):
    """Replay transitions, 3-step pi and the nano-quantized entropy sums in
    python; also pin 0 <= H <= ln(k)."""
    import duckdb
    import math
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.state: r
        for r in all_queries()["events_markov_entropy_rate"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""SELECT user_id, event_type, ts, event_id FROM '{SF}/events.parquet'
            ORDER BY user_id, ts, event_id"""
    ).df()
    trans = defaultdict(lambda: defaultdict(int))
    prev = {}
    for uid, et in zip(df["user_id"], df["event_type"]):
        uid = int(uid)
        if uid in prev:
            trans[prev[uid]][et] += 1
        prev[uid] = et
    p = {
        c: {n: v / sum(d.values()) for n, v in d.items()} for c, d in trans.items()
    }
    states = sorted(p)
    k = len(states)
    pi = {s: 1.0 / k for s in states}
    for _ in range(3):
        nxt = defaultdict(float)
        for c in states:
            for nx, pr in p[c].items():
                nxt[nx] += pi[c] * pr
        pi = dict(nxt)
    hq = {
        c: sum(math.floor(-pr * math.log(pr) * 1e9 + 0.5) for pr in p[c].values())
        for c in states
    }
    rq = sum(math.floor(pi[s] * (hq[s] / 1e9) * 1e9 + 0.5) for s in states)
    for s in states:
        r = rows[s]
        assert abs(r.pi - round(pi[s], 9)) < 1e-12
        assert r.h_conditional == math.floor(hq[s] / 1e3 + 0.5) / 1e6
        assert r.entropy_rate == math.floor(rq / 1e3 + 0.5) / 1e6
        assert 0.0 <= r.entropy_rate <= r.max_entropy + 1e-9
        assert abs(r.max_entropy - math.log(k)) < 1e-6


def test_regression_influence_vs_numpy(spark):
    """Numpy hat-matrix recompute over the same integer day grid; the
    returned top-10 must be the true top-10 by canonicalized Cook's D."""
    import duckdb
    import math
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["ml_regression_influence"].fn(spark, SF).collect()
    df = duckdb.sql(
        f"""WITH d AS (SELECT CAST(ts AS DATE) AS day,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                       FROM '{SF}/events.parquet')
            SELECT date_diff('day', (SELECT min(day) FROM d), day) AS t,
                   strftime(day, '%Y-%m-%d') AS day,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y
            FROM d GROUP BY day"""
    ).df()
    t = df["t"].to_numpy(dtype=float)
    y = df["y"].to_numpy(dtype=float)
    n = len(t)
    tbar = t.sum() / n
    sxx = (t * t).sum() - t.sum() ** 2 / n
    slope = (n * (t * y).sum() - t.sum() * y.sum()) / (n * (t * t).sum() - t.sum() ** 2)
    icept = (y.sum() - slope * t.sum()) / n
    e = y - (icept + slope * t)
    h = 1.0 / n + (t - tbar) ** 2 / sxx
    sse = sum(math.floor(ei * ei * 1000 + 0.5) for ei in e) / 1000.0
    s2 = sse / (n - 2)
    cook = (e * e / s2 / (1 - h)) * (h / (2 * (1 - h)))
    assert abs(h.sum() - 2.0) < 1e-9  # trace of the hat matrix = p
    canon = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    ranked = sorted(
        zip(df["day"], cook, h, e), key=lambda z: (-canon(z[1]), z[0])
    )[:10]
    assert len(rows) == 10
    for r, (day, cd, hh, ee) in zip(rows, ranked):
        assert r.day == day
        assert r.cooks_d == canon(cd)
        assert r.leverage == canon(hh)
        assert abs(r.residual - ee / 1000.0) < 2e-6


def test_price_index_vs_python(spark):
    """Recompute the matched-model baskets in python for every month;
    Fisher must sit between min/max of (L, P) and the base month at 1."""
    import duckdb
    import math
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["orders_price_index"].fn(spark, SF).collect(),
        key=lambda r: r.month,
    )
    df = duckdb.sql(
        f"""SELECT l_partkey part, strftime(date_trunc('month', l_shipdate), '%Y-%m') m,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) pc,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) q
            FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"""
    ).df()
    cell = {}
    for part, m, pc, q in zip(df["part"], df["m"], df["pc"], df["q"]):
        cell[(int(part), m)] = (math.floor(int(pc) / int(q)), int(q))
    months = sorted({m for _, m in cell})
    base_m = months[0]
    base = {p: cell[(p, m)] for (p, m) in cell if m == base_m}
    got = {r.month: r for r in rows}
    for m in months:
        num_l = den_l = num_p = den_p = 0
        np_ = 0
        for (p, mm), (price, q) in cell.items():
            if mm != m or p not in base:
                continue
            p0, q0 = base[p]
            num_l += price * q0
            den_l += p0 * q0
            num_p += price * q
            den_p += p0 * q
            np_ += 1
        r = got[m]
        assert r.n_parts == np_
        canon = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert r.laspeyres == canon(num_l / den_l)
        assert r.paasche == canon(num_p / den_p)
        assert min(r.laspeyres, r.paasche) - 1e-6 <= r.fisher <= max(
            r.laspeyres, r.paasche
        ) + 1e-6
    assert got[base_m].laspeyres == 1.0 and got[base_m].paasche == 1.0


def test_power_mde_vs_python(spark):
    """Closed-form Fleiss recompute; n_per_arm strictly decreasing in the
    effect size."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _Z_ALPHA2,
        _Z_BETA,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["stats_power_mde"].fn(spark, SF).collect(),
        key=lambda r: r.delta,
    )
    [base] = duckdb.sql(
        f"""SELECT count(*) n, sum(conv) c FROM (
              SELECT user_id, max(CASE WHEN event_type='purchase' AND value>=200.0
                                       THEN 1 ELSE 0 END) conv
              FROM '{SF}/events.parquet' GROUP BY user_id)"""
    ).df().itertuples(index=False)
    p0 = base.c / base.n
    prev = None
    for r in rows:
        p1 = p0 + r.delta
        pbar = (p0 + p1) / 2
        narm = math.ceil(
            (
                _Z_ALPHA2 * math.sqrt(2 * pbar * (1 - pbar))
                + _Z_BETA * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
            )
            ** 2
            / r.delta**2
        )
        assert r.n_per_arm == narm
        assert r.x_current_population == (narm * 2) // base.n
        if prev is not None:
            assert r.n_per_arm < prev
        prev = r.n_per_arm


# ---------------------------------------------------------------------------
# wave 21: LSH banding tuner / Bass diffusion
# ---------------------------------------------------------------------------


def test_lsh_tuning_vs_python(spark):
    """Replay the catch-probability sums in python over recomputed exact
    Jaccard pairs; pin the S-curve orderings (recall up / crossover and
    precision down as bands increase at fixed k)."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        _LSH_TUNE_CONFIGS,
        _LSH_TUNE_TAU,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["dedup_lsh_tuning_curve"].fn(spark, SF).collect(),
        key=lambda r: r.bands,
    )
    ss = duckdb.sql(
        rf"""WITH toks AS (SELECT doc_id, source,
                     string_split_regex(trim(text), '\s+') AS words
                 FROM '{SF}/documents.parquet'),
            sh AS (SELECT doc_id, source,
                     list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                    FOR i IN range(1, len(words) - 1)]) AS grams
                   FROM toks),
            inv AS (SELECT doc_id, source, len(grams) AS sz, unnest(grams) AS g
                    FROM sh),
            common AS (
              SELECT a.doc_id ia, b.doc_id ib, a.sz sa, b.sz sb, count(*) nc
              FROM inv a JOIN inv b ON a.source = b.source AND a.g = b.g
              WHERE a.doc_id < b.doc_id GROUP BY 1,2,3,4)
            SELECT nc / (sa + sb - nc) AS s FROM common
            WHERE nc / (sa + sb - nc) >= 0.05"""
    ).df()["s"].to_numpy()
    by_b = {r.bands: r for r in rows}
    for b, r in _LSH_TUNE_CONFIGS:
        qsum = qtrue = ntrue = 0
        for s in ss:
            p = 1.0
            sr = 1.0
            for _ in range(r):
                sr = sr * s
            base = 1.0 - sr
            for _ in range(b):
                p = p * base
            p = 1.0 - p
            q = math.floor(p * 1e9 + 0.5)
            qsum += q
            if s >= _LSH_TUNE_TAU:
                qtrue += q
                ntrue += 1
        row = by_b[b]
        assert row.n_pairs == len(ss)
        assert row.n_true == ntrue
        assert row.exp_candidates == math.floor(qsum / 1e3 + 0.5) / 1e6
        assert row.exp_true == math.floor(qtrue / 1e3 + 0.5) / 1e6
        assert abs(row.expected_recall - qtrue / 1e9 / ntrue) < 2e-6
    for a, bb in zip(rows, rows[1:]):  # bands ascending: 1,2,4,8
        assert bb.expected_recall >= a.expected_recall - 1e-9
        assert bb.crossover_s <= a.crossover_s + 1e-9
        assert bb.expected_precision <= a.expected_precision + 1e-9


def test_bass_recovers_planted_diffusion(spark):
    """A synthetic order table whose daily first-order counts follow an
    exact Bass recurrence (p=.03, q=.38, m=2000) must come back with the
    planted parameters to ~10% and a NEGATIVE quadratic coefficient."""
    import datetime

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )
    import real_time_scraping_and_predicting_time_series_data_spark.operators.funnel as FN
    import real_time_scraping_and_predicting_time_series_data_spark.catalog as C

    p_, q_, m_ = 0.03, 0.38, 2000.0
    base = datetime.date(1995, 1, 1)
    rows = []
    n = 0.0
    ck = 0
    for t in range(60):
        dn = int(round((p_ + q_ * n / m_) * (m_ - n)))
        n += dn
        for _ in range(dn):
            ck += 1
            rows.append((ck, base + datetime.timedelta(days=t)))
    df = spark.createDataFrame(rows, ["o_custkey", "o_orderdate"]).select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("o_orderdate")
    )
    orig = C.load_table
    try:
        C.load_table = lambda sp, sf, name: df  # noqa: ARG005
        FN.load_table = C.load_table
        out = all_queries()["orders_bass_diffusion"].fn(spark, "ignored").collect()[0]
    finally:
        C.load_table = orig
        FN.load_table = orig
    assert out.c < 0
    assert out.m_potential is not None
    assert abs(out.m_potential - m_) / m_ < 0.05
    assert abs(out.p_innovation - p_) / p_ < 0.15
    assert abs(out.q_imitation - q_) / q_ < 0.15


def test_bass_null_verdict_on_uniform_arrivals(spark):
    """On the real (Poisson-arrival) orders the quadratic coefficient must
    NOT be negative-with-positive-root — the no-contagion null: m/p/q all
    NULL, coefficients emitted."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["orders_bass_diffusion"].fn(spark, SF).collect()
    assert row.n_adopters > 0 and row.n_days > 1
    assert row.a is not None and row.b is not None and row.c is not None
    if row.c >= 0:
        assert row.m_potential is None and row.p_innovation is None


# ---------------------------------------------------------------------------
# wave 22: mann-kendall / reconciliation / poisson GLM / streaming KMV
# ---------------------------------------------------------------------------


def test_mann_kendall_vs_python_and_planted_trend(spark):
    """Replay S/ties/z in python on the real grid, then plant a strictly
    increasing series and assert a large positive z."""
    import duckdb
    import math
    from collections import Counter, defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.event_type: r
        for r in all_queries()["ts_mann_kendall_trend"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                       FROM '{SF}/events.parquet')
            SELECT event_type, day,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y
            FROM d GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    series = defaultdict(list)
    for et, y in zip(df["event_type"], df["y"]):
        series[et].append(int(y))
    for et, ys in series.items():
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
        var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
        r = rows[et]
        assert r.n == n and r.mk_s == s
        assert r.var18 == n * (n - 1) * (2 * n + 5) - ties
        if s > 0:
            assert abs(r.z - math.floor((s - 1) / math.sqrt(var) * 1e6 + 0.5) / 1e6) < 1e-12
        elif s < 0:
            assert abs(r.z - math.floor((s + 1) / math.sqrt(var) * 1e6 + 0.5) / 1e6) < 1e-12
    # planted strictly increasing series
    import datetime

    import real_time_scraping_and_predicting_time_series_data_spark.operators.stats as S
    import real_time_scraping_and_predicting_time_series_data_spark.catalog as C

    base = datetime.datetime(2024, 1, 1)
    pdf = spark.createDataFrame(
        [(i, base + datetime.timedelta(days=i), "up", float(10 + i)) for i in range(25)],
        ["event_id", "ts", "event_type", "value"],
    )
    orig = C.load_table
    try:
        C.load_table = lambda sp, sf, name: pdf  # noqa: ARG005
        S.load_table = C.load_table
        [row] = all_queries()["ts_mann_kendall_trend"].fn(spark, "ignored").collect()
    finally:
        C.load_table = orig
        S.load_table = orig
    assert row.mk_s == 25 * 24 // 2  # all pairs concordant
    assert row.z > 4.0


def test_reconciliation_vs_python(spark):
    """Recompute both monthly ledgers in python; diff and relative gap
    must match; months must cover the orders range."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["dq_reconciliation"].fn(spark, SF).collect(),
        key=lambda r: r.month,
    )
    hdr = duckdb.sql(
        f"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') m,
                   count(*) n,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) c
            FROM '{SF}/orders.parquet' GROUP BY 1"""
    ).df().set_index("m")
    lin = duckdb.sql(
        f"""SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') m,
                   sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * (1 + l.l_tax) * 100 + 0.5) AS BIGINT)) c,
                   count(DISTINCT l.l_orderkey) n
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1"""
    ).df().set_index("m")
    assert rows, "joined months exist"
    for r in rows:
        h = int(hdr.loc[r.month, "c"])
        l = int(lin.loc[r.month, "c"])
        assert r.header_cents == h and r.line_cents == l
        assert r.diff_cents == h - l
        assert r.rel_gap == math.floor(abs(h - l) / h * 1e6 + 0.5) / 1e6


def test_poisson_newton_vs_numpy(spark):
    """Numpy replay of the seeded 2-step Newton; and a planted
    exponential-growth count series must recover its growth factor."""
    import duckdb
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["ml_poisson_newton"].fn(spark, SF).collect()
    df = duckdb.sql(
        f"""SELECT date_diff('day', (SELECT min(CAST(ts AS DATE))
                                     FROM '{SF}/events.parquet'),
                             CAST(ts AS DATE)) t, count(*) y
            FROM '{SF}/events.parquet' GROUP BY 1"""
    ).df()
    x = df["t"].to_numpy(dtype=float) / 30.0
    y = df["y"].to_numpy(dtype=float)
    b0, b1 = np.log(y.sum() / len(y)), 0.0
    for _ in range(2):
        mu = np.exp(b0 + b1 * x)
        h00, h01, h11 = mu.sum(), (x * mu).sum(), (x * x * mu).sum()
        g0, g1 = (y - mu).sum(), (x * (y - mu)).sum()
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (-h01 * g0 + h00 * g1) / det
    assert row.n_days == len(y)
    assert abs(row.b0 - b0) < 1e-4
    assert abs(row.b1 - b1) < 1e-4
    assert abs(row.daily_growth_factor - np.exp(b1 / 30.0)) < 1e-5


def test_kmv_stream_serve_matches_batch_and_is_idempotent(spark, tmp_path):
    """Serve == the batch KMV sketch on the same data; replaying a batch
    and compacting must not change the served row (idempotent merge)."""
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.kmv_stream import (
        KmvStreamSketch,
    )

    [batch] = all_queries()["sketch_kmv_distinct"].fn(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    sk = KmvStreamSketch(spark, str(tmp_path / "kmv"))
    for bid in range(4):
        sk.ingest_batch(
            li.filter(F.pmod(F.xxhash64("l_orderkey"), F.lit(4)) == bid), bid
        )
    [served] = sk.serve_sketch().collect()
    # same key universe: distinct (part, supplier) pairs
    assert (served.k, served.kth, served.kmv_estimate) == (
        batch.k,
        batch.kth,
        batch.kmv_estimate,
    )
    sk.ingest_batch(li.filter(F.pmod(F.xxhash64("l_orderkey"), F.lit(4)) == 2), 2)
    assert [tuple(r) for r in sk.serve_sketch().collect()] == [
        (served.k, served.kth, served.kmv_estimate)
    ]
    sk.compact()
    assert [tuple(r) for r in sk.serve_sketch().collect()] == [
        (served.k, served.kth, served.kmv_estimate)
    ]


# ---------------------------------------------------------------------------
# wave 23: k-center seeding / tail dependence
# ---------------------------------------------------------------------------


def test_kcenter_vs_python_farthest_first(spark):
    """Replay the traversal in python (same round-9 argmax + id tiebreak);
    the pick-distance curve must be non-increasing and the radius must
    equal the true max-min over the corpus."""
    import duckdb
    import math
    import numpy as np

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["sim_kcenter_seeds"].fn(spark, SF).collect(),
        key=lambda r: r.seed_rank,
    )
    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    vecs = {int(i): np.array(v, dtype=np.float64) for i, v in zip(df["vec_id"], df["embedding"])}

    def sq(a, b):
        # same expansion as the engine: dot(a,a) - 2 dot(a,b) + dot(b,b)
        return float(a @ a) - 2.0 * float(a @ b) + float(b @ b)

    ids = sorted(vecs)
    seeds = [ids[0]]
    picks = [0.0]
    dmin = {i: sq(vecs[i], vecs[seeds[0]]) for i in ids}
    for _ in range(3):
        best = max(ids, key=lambda i: (round(dmin[i], 9), -i))
        seeds.append(best)
        picks.append(dmin[best])
        for i in ids:
            dmin[i] = min(dmin[i], sq(vecs[i], vecs[best]))
    radius = max(round(d, 9) for d in dmin.values())
    canon = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    assert [r.vec_id for r in rows] == seeds
    for r, p in zip(rows, picks):
        assert abs(r.sq_dist_at_pick - canon(p)) < 1e-9
        assert r.coverage_radius_sq == canon(radius)
    for a, b in zip(rows[1:], rows[2:]):  # curve non-increasing after pick 1
        assert b.sq_dist_at_pick <= a.sq_dist_at_pick + 1e-9
    assert rows[-1].coverage_radius_sq <= rows[-1].sq_dist_at_pick + 1e-9
    assert len({r.vec_id for r in rows}) == 4


def test_tail_dependence_vs_python(spark):
    """Replay the discrete-q90 rule and exceedance counts in python."""
    import duckdb
    import math
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["stats_tail_dependence"].fn(spark, SF).collect()
    df = duckdb.sql(
        f"""WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                       FROM '{SF}/events.parquet'
                       WHERE event_type IN ('click', 'purchase'))
            SELECT day, event_type,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y
            FROM d GROUP BY 1, 2"""
    ).df()
    per_day = defaultdict(dict)
    for day, et, y in zip(df["day"], df["event_type"], df["y"]):
        per_day[day][et] = int(y)
    pairs = [
        (d["click"], d["purchase"]) for d in per_day.values() if len(d) == 2
    ]
    n = len(pairs)

    def q90(vals):
        from collections import Counter

        need = math.ceil(0.9 * n)
        counts = Counter(vals)
        cum = 0
        for v in sorted(counts):
            cum += counts[v]
            if cum >= need:
                return v
        return max(vals)

    tx = q90([x for x, _ in pairs])
    ty = q90([y for _, y in pairs])
    nx = sum(1 for x, _ in pairs if x > tx)
    ny = sum(1 for _, y in pairs if y > ty)
    nj = sum(1 for x, y in pairs if x > tx and y > ty)
    assert row.n_days == n
    assert row.x_q90_milli == tx and row.y_q90_milli == ty
    assert (row.n_x_exceed, row.n_y_exceed, row.n_joint) == (nx, ny, nj)
    canon = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    if ny:
        assert row.lambda_upper == canon(nj / ny)
    assert row.independence_joint_rate == canon(nx * ny / (n * n))


# ---------------------------------------------------------------------------
# wave 24: DOW seasonality / mSPRT always-valid p
# ---------------------------------------------------------------------------


def test_dow_seasonality_vs_python(spark):
    """Replay the quantized chi-square and the even-df(6) closed-form p."""
    import duckdb
    import math
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.event_type: r
        for r in all_queries()["events_dow_seasonality"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""SELECT event_type, CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) dow,
                   count(*) n
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).df()
    agg = defaultdict(dict)
    for et, dow, n in zip(df["event_type"], df["dow"], df["n"]):
        agg[et][int(dow)] = int(n)
    for et, cells in agg.items():
        total = sum(cells.values())
        e = total / 7.0
        chi_q = sum(
            math.floor((n - e) * (n - e) / e * 1e6 + 0.5) for n in cells.values()
        )
        r = rows[et]
        assert r.n_events == total
        assert r.n_dows_present == len(cells)
        assert r.chi2 == math.floor(chi_q / 1e3 + 0.5) / 1e3
        if len(cells) == 7:
            x = chi_q / 1e6
            p = math.exp(-x / 2) * (1 + x / 2 + x * x / 8)
            assert abs(r.p_value - p) < 2e-6
            assert 0.0 <= r.p_value <= 1.0


def test_msprt_vs_python_and_monotone_p(spark):
    """Replay the mixture likelihood ratio; the always-valid p must be
    non-increasing in time and equal 1/running-max(quantized lambda)."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _MSPRT_P0,
        _MSPRT_TAU2,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["stats_msprt_always_valid"].fn(spark, SF).collect(),
        key=lambda r: r.day,
    )
    df = duckdb.sql(
        f"""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                   count(*) AS n,
                   count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS u
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    cu = cn = 0
    maxq = 0
    expect = []
    for day, n, u in zip(df["day"], df["n"], df["u"]):
        cu += int(u)
        cn += int(n)
        v = _MSPRT_P0 * (1 - _MSPRT_P0) / cn
        diff = cu / cn - _MSPRT_P0
        lam = math.sqrt(v / (v + _MSPRT_TAU2)) * math.exp(
            diff * diff * _MSPRT_TAU2 / (2 * v * (v + _MSPRT_TAU2))
        )
        maxq = max(maxq, math.floor(lam * 1e9 + 0.5))
        expect.append((day, lam, maxq))
    assert len(rows) == min(120, len(expect))
    prev_p = 1.0
    for r, (day, lam, mq) in zip(rows, expect):
        assert r.day == day
        assert r.lambda_n == math.floor(lam * 1e3 + 0.5) / 1e3
        p = math.floor(min(1.0, 1e9 / mq) * 1e6 + 0.5) / 1e6
        assert r.always_valid_p == p
        assert r.always_valid_p <= prev_p + 1e-12
        prev_p = r.always_valid_p


# ---------------------------------------------------------------------------
# wave 25: bayesian A/B / generalized ESD
# ---------------------------------------------------------------------------


def test_bayes_ab_vs_python_exact(spark):
    """Replay the quantized log-ratio cumsum in python AND cross-check
    against a direct float evaluation of Cook's closed form."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    [row] = all_queries()["stats_bayes_ab_probability"].fn(spark, SF).collect()
    [base] = duckdb.sql(
        f"""SELECT sum(CASE WHEN arm=0 THEN 1 ELSE 0 END) na,
                   sum(CASE WHEN arm=0 THEN conv ELSE 0 END) ca,
                   sum(CASE WHEN arm=1 THEN 1 ELSE 0 END) nb,
                   sum(CASE WHEN arm=1 THEN conv ELSE 0 END) cb
            FROM (SELECT user_id % 2 arm,
                         max(CASE WHEN event_type='purchase' AND value>=200.0
                                  THEN 1 ELSE 0 END) conv
                  FROM '{SF}/events.parquet' GROUP BY user_id)"""
    ).df().itertuples(index=False)
    aa, ba = int(base.ca) + 1, int(base.na - base.ca) + 1
    ab, bb = int(base.cb) + 1, int(base.nb - base.cb) + 1
    # quantized replay (must equal the engines bit-for-bit)
    lg = lambda n: sum(  # noqa: E731
        math.floor(math.log(k) * 1e9 + 0.5) for k in range(1, n)
    )
    lnt0_q = lg(ba + bb) - lg(aa + ba + bb) + lg(aa + ba) - lg(ba)
    cum = 0
    pq = 0
    for i in range(ab):
        pq += math.floor(math.exp((lnt0_q + cum) / 1e9) * 1e12 + 0.5)
        cum += (
            math.floor(math.log(aa + i) * 1e9 + 0.5)
            + math.floor(math.log(bb + i) * 1e9 + 0.5)
            - math.floor(math.log(aa + ba + bb + i) * 1e9 + 0.5)
            - math.floor(math.log(1 + i) * 1e9 + 0.5)
        )
    assert row.p_b_beats_a == math.floor(pq / 1e6 + 0.5) / 1e6
    # independent float evaluation of the closed form (lgamma-based)
    from math import lgamma, exp, log

    def lnB(x, y):
        return lgamma(x) + lgamma(y) - lgamma(x + y)

    p = sum(
        exp(lnB(aa + i, ba + bb) - log(bb + i) - lnB(1 + i, bb) - lnB(aa, ba))
        for i in range(ab)
    )
    assert abs(row.p_b_beats_a - p) < 1e-5
    assert 0.0 <= row.p_b_beats_a <= 1.0
    assert abs(
        row.expected_lift - (ab / (ab + bb) - aa / (aa + ba))
    ) < 1e-6


def test_gesd_vs_python_and_unmasking(spark):
    """Python replay of the three remove-and-recompute rounds; plus a
    masking fixture: two planted extremes must BOTH surface across
    rounds 1-2 with R recomputed each time."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["ts_gesd_outliers"].fn(spark, SF).collect(),
        key=lambda r: r.round,
    )
    df = duckdb.sql(
        f"""WITH d AS (SELECT CAST(ts AS DATE) AS day,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                       FROM '{SF}/events.parquet')
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y
            FROM d GROUP BY day"""
    ).df()
    grid = {d: int(y) for d, y in zip(df["day"], df["y"])}
    for r in rows:
        n = len(grid)
        s = sum(grid.values())
        ss = sum(y * y for y in grid.values())
        mu = s / n
        sd = math.sqrt((ss - s * s / n) / (n - 1))
        # engine tiebreak: day ASC among round-9 ties -> min day
        rv = lambda d: round(abs(grid[d] - mu) / sd, 9) if sd > 0 else 0.0  # noqa: E731
        top = max(rv(d) for d in grid)
        best = min(d for d in grid if rv(d) == top)
        assert r.day == best
        assert r.n_remaining == n
        expect_r = abs(grid[best] - mu) / sd if sd > 0 else 0.0
        assert r.r_stat == math.floor(expect_r * 1e6 + 0.5) / 1e6
        del grid[best]
    # masking fixture
    import datetime

    import real_time_scraping_and_predicting_time_series_data_spark.operators.stats as S
    import real_time_scraping_and_predicting_time_series_data_spark.catalog as C

    base = datetime.datetime(2024, 1, 1)
    vals = [10.0] * 28 + [500.0, 500.0]  # two masked extremes
    pdf = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=i), "a", v)
            for i, v in enumerate(vals)
        ],
        ["event_id", "ts", "event_type", "value"],
    )
    orig = C.load_table
    try:
        C.load_table = lambda sp, sf, name: pdf  # noqa: ARG005
        S.load_table = C.load_table
        out = sorted(
            all_queries()["ts_gesd_outliers"].fn(spark, "ignored").collect(),
            key=lambda r: r.round,
        )
    finally:
        C.load_table = orig
        S.load_table = orig
    assert out[0].day_mean == 500.0 and out[1].day_mean == 500.0
    assert out[1].r_stat > out[0].r_stat  # unmasking: R GROWS after removal
    assert out[2].day_mean == 10.0
    assert out[2].r_stat == 0.0  # constant survivors -> guarded zero R


# ---------------------------------------------------------------------------
# wave 26: forecast combination
# ---------------------------------------------------------------------------


def test_forecast_combination_vs_python(spark):
    """Replay the full pipeline (grid, split, three models, quantized
    SSEs, weights, test errors) in python; plus the Bates-Granger sanity
    pin: the combo never does much worse than the best component."""
    import duckdb
    import math
    from collections import defaultdict

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.event_type: r
        for r in all_queries()["ts_forecast_combination"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                       FROM '{SF}/events.parquet')
            SELECT event_type, day,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y
            FROM d GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    series = defaultdict(list)
    for et, y in zip(df["event_type"], df["y"]):
        series[et].append(int(y))
    q3 = lambda e: math.floor(e / 1000.0 + 0.5)  # noqa: E731
    for et, ys in series.items():
        n = len(ys)
        k = math.ceil(2.0 * n / 3.0)
        train, test = ys[:k], ys[k:]
        mu = math.floor(sum(train) / k)
        last_y, first_y = train[-1], train[0]
        slope = (last_y - first_y) / (k - 1)
        sse_mean = sum(q3((y - mu) ** 2) for y in train)
        sse_naive = sum(
            q3((train[i] - train[i - 1]) ** 2) for i in range(1, k)
        )
        sse_drift = sum(
            q3((train[i] - train[i - 1] - slope) ** 2) for i in range(1, k)
        )
        wm, wn, wd = 1.0 / sse_mean, 1.0 / sse_naive, 1.0 / sse_drift
        te = [0, 0, 0, 0]
        for i, y in enumerate(test):
            t = k + i
            fm, fn_, fd = float(mu), float(last_y), last_y + slope * (t - (k - 1))
            fc = (wm * fm + wn * fn_ + wd * fd) / (wm + wn + wd)
            te[0] += q3((y - fm) ** 2)
            te[1] += q3((y - fn_) ** 2)
            te[2] += q3((y - fd) ** 2)
            te[3] += q3((y - fc) ** 2)
        r = rows[et]
        assert r.n_train == k and r.n_test == len(test)
        ws = wm + wn + wd
        assert r.w_mean == math.floor(wm / ws * 1e6 + 0.5) / 1e6
        assert r.w_naive == math.floor(wn / ws * 1e6 + 0.5) / 1e6
        rm = lambda q: math.floor(  # noqa: E731
            math.sqrt(q * 1000.0 / len(test)) / 1000.0 * 1000 + 0.5
        ) / 1000
        assert r.rmse_mean == rm(te[0])
        assert r.rmse_naive == rm(te[1])
        assert r.rmse_drift == rm(te[2])
        assert r.rmse_combo == rm(te[3])
        best = min(r.rmse_mean, r.rmse_naive, r.rmse_drift)
        worst = max(r.rmse_mean, r.rmse_naive, r.rmse_drift)
        # Bates-Granger holds in expectation, not per sample: pin the
        # defensible envelope — never worse than the worst component,
        # and close to the best without having chosen it.
        assert r.rmse_combo <= worst
        assert r.rmse_combo <= best * 1.5


# ---------------------------------------------------------------------------
# wave 27: threshold selection
# ---------------------------------------------------------------------------


def test_threshold_selection_invariants(spark):
    """Cross-consistency pins: max-F1 row's f1 equals ml_pr_auc's best_f1;
    confusion quadrants sum to the population; youden in [-1, 1]; both
    chosen stats are the maxima of their own columns."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.criterion: r
        for r in all_queries()["ml_threshold_selection"].fn(spark, SF).collect()
    }
    [pr] = all_queries()["ml_pr_auc"].fn(spark, SF).collect()
    f1row, jrow = rows["max_f1"], rows["max_youden"]
    assert f1row.f1 == pr.best_f1  # same grid, same maximum
    for r in (f1row, jrow):
        assert r.tp + r.fn == pr.n_pos
        assert r.fp + r.tn == pr.n_neg
        assert 0.0 <= r.threshold <= 1.0
        assert -1.0 <= r.youden_j <= 1.0
        assert abs(
            r.f1 - 2 * r.tp / (2 * r.tp + r.fp + r.fn)
        ) < 2e-6
        assert abs(
            r.precision_at - r.tp / (r.tp + r.fp)
        ) < 2e-6
    assert jrow.youden_j >= f1row.youden_j - 1e-9
    assert f1row.f1 >= jrow.f1 - 1e-9


# ---------------------------------------------------------------------------
# wave 28: exact payload dedup + mergeable-store hypothesis properties
# ---------------------------------------------------------------------------


def test_payload_dedup_planted_and_sf01(spark):
    """Planted byte-identical payloads across kind tags must group with
    correct survivor/bytes arithmetic; the real corpus is empty at
    sf0.001/sf0.01 (true answer — first raw duplicates appear at sf0.1,
    pinned here)."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )
    import real_time_scraping_and_predicting_time_series_data_spark.operators.multimodal as M
    import real_time_scraping_and_predicting_time_series_data_spark.catalog as C

    assert all_queries()["multimodal_exact_payload_dedup"].fn(spark, SF).count() == 0
    n_sf01 = int(
        duckdb.sql(
            "select count(*) from (select text, count(*) c from "
            "read_parquet('/root/testdata/sf0.1/documents.parquet') "
            "group by 1 having count(*)>=2)"
        ).df().iloc[0, 0]
    )
    rows01 = (
        all_queries()["multimodal_exact_payload_dedup"]
        .fn(spark, "/root/testdata/sf0.1")
        .collect()
    )
    assert len(rows01) == n_sf01 and n_sf01 > 0
    # planted: doc_ids 0,1,2 share bytes (kinds image/audio/video), 3 unique
    pdf = spark.createDataFrame(
        [
            (0, "same bytes here", "en", "src0", 15),
            (1, "same bytes here", "en", "src0", 15),
            (2, "same bytes here", "en", "src1", 15),
            (3, "unique bytes", "en", "src0", 12),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    orig = C.load_table
    try:
        C.load_table = lambda sp, sf, name: pdf  # noqa: ARG005
        M.load_table = C.load_table
        [g] = all_queries()["multimodal_exact_payload_dedup"].fn(spark, "x").collect()
    finally:
        C.load_table = orig
        M.load_table = orig
    assert g.n_copies == 3 and g.survivor_id == 0
    assert g.n_bytes == len("same bytes here")
    assert g.bytes_saved == 2 * g.n_bytes
    assert g.n_kinds == 3  # content hash ignores the modality tag


def test_sprt_grid_mergeability_property(spark):
    """Hypothesis property: ANY partition of the order stream into
    micro-batches serves the exact batch SPRT trajectory (the count
    grids' disjointness contract, exercised at the grid level without
    touching disk)."""
    from hypothesis import given, settings, strategies as st

    import datetime

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        sprt_day_grid,
        sprt_readout_from_day_grid,
    )
    from pyspark.sql import functions as FF

    base = datetime.datetime(1995, 1, 1)

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 19), st.booleans()), min_size=8, max_size=40
        ),
        st.integers(2, 4),
    )
    def prop(orders, n_batches):
        rows = [
            (
                i,
                base + datetime.timedelta(days=day),
                "1-URGENT" if urgent else "5-LOW",
            )
            for i, (day, urgent) in enumerate(orders)
        ]
        df = spark.createDataFrame(
            rows, ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )
        batch_out = [
            tuple(r)
            for r in sprt_readout_from_day_grid(sprt_day_grid(df)).collect()
        ]
        grids = [
            sprt_day_grid(
                df.filter(FF.pmod(FF.col("o_orderkey"), FF.lit(n_batches)) == b)
            )
            for b in range(n_batches)
        ]
        merged = grids[0]
        for g in grids[1:]:
            merged = merged.union(g)
        merged = merged.groupBy("day").agg(
            FF.sum("n").cast("long").alias("n"), FF.sum("u").cast("long").alias("u")
        )
        served = [
            tuple(r) for r in sprt_readout_from_day_grid(merged).collect()
        ]
        assert served == batch_out

    prop()


def test_kmv_merge_law_property():
    """Hypothesis property (pure python — the merge law is engine-free):
    for ANY split of any hash multiset into parts, union-then-keep-k of
    the per-part sketches equals the global sketch."""
    from hypothesis import given, settings, strategies as st

    K = 16

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(1, 1 << 60), min_size=1, max_size=200),
        st.integers(2, 5),
    )
    def prop(hashes, parts):
        glob = sorted(set(hashes))[:K]
        sketches = [
            sorted({h for h in hashes if h % parts == p})[:K] for p in range(parts)
        ]
        merged = sorted(set().union(*[set(s) for s in sketches]))[:K]
        assert merged == glob

    prop()


# ---------------------------------------------------------------------------
# wave 29: anomaly consensus
# ---------------------------------------------------------------------------


def test_anomaly_consensus_vs_python(spark):
    """Python replay of all three detectors and the vote rule; plus a
    planted spike must collect all three votes."""
    import duckdb
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = {
        r.day: r for r in all_queries()["ts_anomaly_consensus"].fn(spark, SF).collect()
    }
    df = duckdb.sql(
        f"""WITH d AS (SELECT CAST(ts AS DATE) AS day,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                       FROM '{SF}/events.parquet')
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS y
            FROM d GROUP BY day"""
    ).df()
    grid = {d: int(y) for d, y in zip(df["day"], df["y"])}
    n = len(grid)
    s = sum(grid.values())
    ss = sum(y * y for y in grid.values())
    mu, sd = s / n, math.sqrt((ss - s * s / n) / (n - 1))

    def disc_med(vals):
        from collections import Counter

        counts = Counter(vals)
        cum = 0
        for v in sorted(counts):
            cum += counts[v]
            if cum * 2 >= n:
                return v

    m = disc_med(list(grid.values()))
    mad = disc_med([abs(y - m) for y in grid.values()])
    flagged = {}
    for d, y in grid.items():
        z = abs(y - mu) / sd
        rz = abs(y - m) / (1.4826 * mad) if mad > 0 else None
        rel = (y - m) / max(m, 1)
        votes = (z > 2.5) + (rz is not None and rz > 2.5) + (abs(rel) > 0.5)
        if votes >= 1:
            flagged[d] = (z, rz, rel, votes)
    assert set(rows) == set(flagged)
    for d, (z, rz, rel, votes) in flagged.items():
        r = rows[d]
        assert r.n_votes == votes
        assert r.z_score == math.floor(z * 1e6 + 0.5) / 1e6
        if rz is not None:
            assert r.robust_z == math.floor(rz * 1e6 + 0.5) / 1e6
    # planted spike gets all three votes
    import datetime

    import real_time_scraping_and_predicting_time_series_data_spark.operators.stats as S
    import real_time_scraping_and_predicting_time_series_data_spark.catalog as C

    base = datetime.datetime(2024, 1, 1)
    vals = [10.0 + (i % 3) for i in range(29)] + [900.0]
    pdf = spark.createDataFrame(
        [(i, base + datetime.timedelta(days=i), "a", v) for i, v in enumerate(vals)],
        ["event_id", "ts", "event_type", "value"],
    )
    orig = C.load_table
    try:
        C.load_table = lambda sp, sf, name: pdf  # noqa: ARG005
        S.load_table = C.load_table
        out = all_queries()["ts_anomaly_consensus"].fn(spark, "x").collect()
    finally:
        C.load_table = orig
        S.load_table = orig
    spike = [r for r in out if r.day_mean == 900.0]
    assert spike and spike[0].n_votes == 3


# ---------------------------------------------------------------------------
# plan pins for the r10 session operators' scale shapes
# ---------------------------------------------------------------------------


def _optimized(spark, name):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    return (
        all_queries()[name].fn(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    )


def _physical(spark, name):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    return (
        all_queries()[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def test_kmv_topk_is_takeordered_not_global_sort(spark):
    """The k-smallest-hash cut must plan as TakeOrdered (per-partition
    heaps + driver merge of k rows), never a global Sort+Limit."""
    plan = _physical(spark, "sketch_kmv_distinct")
    assert "TakeOrderedAndProject" in plan
    body = plan.split("TakeOrderedAndProject")[0]
    assert "Sort " not in body


def test_elastic_net_single_scan(spark):
    """The 18 coordinate-descent rounds must not multiply scans: exactly
    ONE documents parquet scan in the whole plan."""
    plan = _optimized(spark, "ml_elastic_net_cd")
    assert plan.count("Relation") == 1, plan.count("Relation")


def test_mann_kendall_pair_join_is_on_grid_not_rows(spark):
    """The S-statistic's pair join must take two GRID-side aggregates as
    inputs — the raw events relation is scanned for grouped means, never
    self-joined at row level (the join inputs are Aggregates)."""
    plan = _optimized(spark, "ts_mann_kendall_trend")
    join_idx = plan.find("Join Inner")
    assert join_idx > 0
    # both join children in the optimized tree are aggregates over the
    # day grid (the string between the join and the scans shows Aggregate
    # before any Relation)
    after = plan[join_idx:]
    first_rel = after.find("Relation")
    assert "Aggregate" in after[:first_rel]


def test_gesd_and_kcenter_iterations_use_checkpoints(spark):
    """Iterative remove/pick rounds must build on materialized local
    checkpoints (LogicalRDD), not re-derive the full lineage per round."""
    for name in ("ts_gesd_outliers", "sim_kcenter_seeds"):
        plan = _optimized(spark, name)
        assert "LogicalRDD" in plan, name


def test_sprt_stream_serve_grid_bounded_state(spark, tmp_path):
    """The SPRT store's state relation is the (day, n, u) grid — row count
    bounded by distinct days regardless of how many orders streamed in."""
    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.sprt_stream import (
        SprtStreamMonitor,
    )

    o = load_table(spark, SF, "orders")
    mon = SprtStreamMonitor(spark, str(tmp_path / "s"))
    for bid in range(3):
        mon.ingest_batch(
            o.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(3)) == bid), bid
        )
    n_days = int(
        duckdb.sql(
            f"select count(distinct CAST(o_orderdate AS DATE)) from '{SF}/orders.parquet'"
        ).df().iloc[0, 0]
    )
    mon.compact()
    assert mon.serve_grid().count() == n_days
