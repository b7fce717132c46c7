"""Round-9 operators: compressed codes inside the IVF cell join with
relation-side query sets (binary Hamming + SQ8 ADC), and their audits."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
    binary_hamming_topk,
    ivf_binary_topk_relation,
    sq8_adc_topk,
    sq8_topk_relation,
)

SF = "/root/testdata/sf0.001"


def _no_query_broadcast(out):
    """Plan pin shared by the relation serves: the candidate join must be
    a shuffle join on the cell key; any BroadcastHashJoin present must not
    be keyed on cell (only the one-row centroid/code model broadcasts)."""
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert "cell" not in ln.split("BroadcastHashJoin")[1].split(",")[0]


def test_ivf_binary_relation_plan_has_no_query_broadcast(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    _no_query_broadcast(ivf_binary_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2))


def test_sq8_relation_plan_has_no_query_broadcast(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    _no_query_broadcast(sq8_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2))


def test_ivf_binary_full_probe_equals_full_scan(spark):
    """With nprobe = n_cells every cell is probed, so the cell-pruned
    composition must reproduce the full-scan `binary_hamming_topk`
    EXACTLY (same pool, same queries, same tie-breaks) — pins that the
    IVF stage only prunes, never re-ranks."""
    emb = load_table(spark, SF, "embeddings")
    n_q = 8
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = binary_hamming_topk(emb, k=5, pool=15, n_queries=n_q)
    composed = ivf_binary_topk_relation(
        emb, queries, k=5, n_cells=8, nprobe=8, pool=15
    )
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b and len(a) == n_q * 5


def test_sq8_full_probe_equals_full_scan(spark):
    """SQ8 twin of the full-probe identity: nprobe = n_cells composition
    == the broadcast full-scan `sq8_adc_topk`."""
    emb = load_table(spark, SF, "embeddings")
    n_q = 8
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = sq8_adc_topk(emb, k=5, pool=15, n_queries=n_q)
    composed = sq8_topk_relation(emb, queries, k=5, n_cells=8, nprobe=8, pool=15)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b and len(a) == n_q * 5


def test_ivf_binary_relation_external_query_ids(spark):
    """External-id query relation (the ADVICE r8 shape): 3k queries whose
    ids collide with corpus ids must NOT lose neighbors when
    exclude_self=False — every query returns exactly k ranked rows."""
    emb = load_table(spark, SF, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    nq = 3_000
    queries = spark.range(nq).select(
        F.col("id").alias("query_id"),  # deliberately overlapping id space
        F.array(
            *[
                (F.sin(F.col("id") * 0.61 + i) + F.lit(1.2)).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    out = ivf_binary_topk_relation(
        emb, queries, k=3, n_cells=8, nprobe=2, pool=10, exclude_self=False
    )
    agg = out.groupBy("query_id").agg(F.count("*").alias("n"), F.max("rank").alias("mx"))
    rows = agg.collect()
    assert len(rows) == nq
    assert all(r.n == 3 and r.mx == 3 for r in rows)


def test_fixed_lstm_forward_properties(spark):
    """The fixed-weight LSTM twin (M1/M3 in-CI path): deterministic across
    calls, sensitive to its input (different windows -> different
    forecasts), output bounded by the hard-activation envelope (|y| <=
    50 * 0.1 + 0.1 after the Dense fold), and zero-input gives the pure
    bias-driven baseline rather than zeros."""
    from real_time_scraping_and_predicting_time_series_data_spark.ml.keras_forecast import (
        fixed_lstm_forward,
    )

    xs_a = [i / 9.0 for i in range(10)]
    xs_b = [1.0 - i / 9.0 for i in range(10)]
    a1, a2, b = fixed_lstm_forward(xs_a), fixed_lstm_forward(xs_a), fixed_lstm_forward(xs_b)
    assert a1 == a2  # bit-identical rerun
    assert a1 != b  # input sensitivity
    assert all(abs(y) <= 5.1 for y in a1)  # |h2|<=1 so |dense| <= 50*0.1+0.1
    z = fixed_lstm_forward([0.0] * 10)
    assert any(abs(y) > 1e-9 for y in z)
    # r10 (ADVICE r9): a window shorter than _SEQ is SKIPPED (empty
    # forecast), never an IndexError — mirrors the query-side
    # size(xs) >= _SEQ filter and the oracle's HAVING count(*) >= _SEQ.
    assert fixed_lstm_forward([]) == []
    assert fixed_lstm_forward([0.5] * 9) == []


def test_lstm_query_shape_and_determinism(spark):
    """ml_lstm_fixed_inference: one 5-step forecast per event_type, rerun-
    identical, forecasts inside the window's [mn, mx] span widened by the
    dense envelope."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    fn = all_queries()["ml_lstm_fixed_inference"].fn
    a = sorted(map(tuple, fn(spark, SF).collect()))
    b = sorted(map(tuple, fn(spark, SF).collect()))
    assert a == b
    types = {r[0] for r in a}
    assert len(a) == len(types) * 5
    steps = sorted(r[1] for r in a if r[0] == a[0][0])
    assert steps == [1, 2, 3, 4, 5]


def test_clusters_stopgram_hot_shingle_skew_stress(spark):
    """Skew stress for the clustering edge build (VERDICT r8 item 7):
    85% of docs share a boilerplate header whose 2-grams are corpus-hot.
    Uncapped, every hot shingle contributes df² candidate rows (here the
    hot pairs are also REAL 0.05-Jaccard edges, so the output itself is
    quadratic — ~14k pairs from 170 docs).  With the stop-gram df cap the
    candidate volume collapses to the planted rare near-dups only, the
    planted pairs still cluster together, and boilerplate-only docs come
    out isolated."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )

    boiler = "terms of service apply to all users of this site"
    n_hot = 170  # 85% of 200
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c", "s") for i in range(n_hot)]
    rows += [
        (1000 + i, " ".join(f"rare{i}{c}" for c in "abcdefgh"), "s")
        for i in range(27)
    ]
    # 3 planted near-dup pairs sharing rare filler (no boilerplate at all)
    for j, base in enumerate((2000, 2010, 2020)):
        filler = " ".join(f"dup{j}{c}" for c in "abcdefgh")
        rows.append((base, f"{filler} x{j}", "s"))
        rows.append((base + 1, f"{filler} y{j}", "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    uncapped = jaccard_pairs(docs, block="source", n=2, threshold=0.05).count()
    assert uncapped >= n_hot * (n_hot - 1) // 2  # the quadratic hot term

    capped = jaccard_pairs(
        docs, block="source", n=2, threshold=0.05, max_df=32
    )
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert pairs == {(2000, 2001), (2010, 2011), (2020, 2021)}

    edges = capped.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = {
        r.node: r.label
        for r in connected_components(edges, docs.select("doc_id")).collect()
    }
    assert labels[2001] == 2000 and labels[2011] == 2010 and labels[2021] == 2020
    # every boilerplate-only doc is its own cluster under the cap
    assert all(labels[i] == i for i in range(n_hot))


def test_stopgram_cap_plan_filters_before_selfjoin(spark):
    """Plan pin: the df-cap anti-join must sit BELOW the inverted-index
    self-join (candidates never materialize for capped shingles), and the
    hot-set side of that anti-join must be a broadcast — the posting list
    is never exchanged for the filter."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"a b c w{i} z{i}", "s") for i in range(40)],
        "doc_id long, text string, source string",
    )
    out = jaccard_pairs(docs, block="source", n=2, threshold=0.05, max_df=8)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    join_at = opt.find("Join Inner")
    anti_at = opt.find("Join LeftAnti")
    assert join_at != -1 and anti_at != -1
    # optimizedPlan prints top-down: the anti-join must appear BELOW
    # (after) the candidate self-join, i.e. on the join's input subtree
    assert anti_at > join_at
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys and "LeftAnti" in phys


def test_star_cc_equals_minlabel_cc(spark):
    """connected_components_star must produce EXACTLY the labels of the
    min-label propagation on an adversarial mix: chains, a star, a
    clique, isolated nodes, and duplicate/reversed edges."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = (
        [(i, i + 1) for i in range(0, 19)]  # 20-node chain
        + [(100, x) for x in range(101, 110)]  # star
        + [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]  # clique
        + [(300, 301), (301, 300), (300, 301)]  # dupes + reversal
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame(
        [(i,) for i in range(0, 20)]
        + [(i,) for i in range(100, 110)]
        + [(i,) for i in range(200, 205)]
        + [(300,), (301,), (999,)],  # 999 isolated
        "node long",
    )
    a = sorted(map(tuple, connected_components(e, n).collect()))
    b = sorted(map(tuple, connected_components_star(e, n).collect()))
    assert a == b
    lbl = dict(b)
    assert lbl[19] == 0 and lbl[109] == 100 and lbl[204] == 200 and lbl[999] == 999


def test_star_cc_converges_log_rounds_on_long_chain(spark):
    """The whole point of the escalation: a 256-node chain (diameter 255)
    must converge within max_iter=12 star rounds — min-label propagation
    would need 255.  Every node labels to node 0."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        connected_components_star,
    )

    n_nodes = 256
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n_nodes - 1)], "src long, dst long"
    )
    n = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    labels = connected_components_star(e, n, max_iter=12).collect()
    assert len(labels) == n_nodes
    assert all(r.label == 0 for r in labels)


def test_skyline_matches_bruteforce_dominance(spark):
    """The running-max skyline must equal the O(n²) dominance definition
    on a synthetic with duplicates, same-day ties, and a strictly
    dominated chain."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["orders_skyline"].fn(spark, SF).collect()
    assert rows
    # brute-force check against the full orders relation at this SF
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    base = [
        (r.segment, r.o_orderkey, r.o_totalprice, r.d)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            "o_totalprice",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).cast("long").alias("d"),
        )
        .collect()
    ]
    by_seg = {}
    for seg, k, p, d in base:
        by_seg.setdefault(seg, []).append((k, p, d))
    want = set()
    for seg, pts in by_seg.items():
        for k, p, d in pts:
            dominated = any(
                (p2 >= p and d2 >= d and (p2 > p or d2 > d))
                for k2, p2, d2 in pts
                if k2 != k
            )
            if not dominated:
                want.add((seg, k))
    got = {(r.segment, r.o_orderkey) for r in rows}
    assert got == want


def test_hybrid_retrieval_fuses_both_rankers(spark):
    """Hybrid RRF: 10 fused rows per anchor, rrf scores within the
    theoretical band (one ranker's floor 1/(60+20) … two rankers' ceiling
    2/61), descending down the ranks, and at least one fused top-10 hit
    per anchor that only ONE side could have contributed (rrf below the
    two-ranker floor 2/(60+20))."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["hybrid_retrieval_rrf"].fn(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {3, 7, 11}
    lo, hi = 1.0 / 80, 2.0 / 61
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) == 10 and [r.rank for r in rs] == list(range(1, 11))
        assert all(lo - 1e-9 <= r.rrf <= hi + 1e-9 for r in rs)
        assert all(rs[i].rrf >= rs[i + 1].rrf for i in range(9))
        # Single-side contribution: a doc ranked by BOTH sides scores at
        # least 1/(60+20) + 1/(60+20) = 2/80; anything below that floor can
        # only have come from ONE ranker — fusion genuinely mixed the lists.
        assert any(r.rrf < 2.0 / 80 - 1e-9 for r in rs)


def test_bm25_eval_metrics_are_consistent(spark):
    """Retrieval eval invariants: one row per panel query; hits@5 <=
    min(5, n_relevant); precision@5 = hits@5/5; mrr in [0,1] and mrr >=
    1/k when any top-k hit exists."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["text_bm25_eval"].fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r.hits_at_5 <= min(5, r.n_relevant)
        assert abs(r.precision_at_5 - r.hits_at_5 / 5.0) < 1e-9
        assert 0.0 <= r.mrr <= 1.0
        if r.hits_at_5 > 0:
            assert r.mrr >= 1.0 / 10


def test_purged_time_split_honors_embargo(spark):
    """Purged k-fold: every fold's realized train-to-test gap exceeds the
    embargo, roles partition the full day grid, and test blocks tile the
    calendar (fold sizes within 1 day of each other)."""
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["ml_purged_time_split"].fn(spark, SF).collect(),
        key=lambda r: r.fold,
    )
    assert [r.fold for r in rows] == [0, 1, 2, 3, 4]
    n_days = (
        load_table(spark, SF, "events")
        .select(F.date_trunc("day", "ts"))
        .distinct()
        .count()
    )
    sizes = [r.n_test_days for r in rows]
    assert sum(sizes) == n_days and max(sizes) - min(sizes) <= 1
    for r in rows:
        assert r.n_train_days + r.n_test_days + r.n_purged_days == n_days
        if r.n_train_days:
            assert r.min_train_test_gap > 2  # embargo


def test_cluster_split_has_zero_leaks(spark):
    """The leakage FIX: splitting by cluster id must produce exactly zero
    cross-split near-dup pairs (corpus_split_leakage found >0 with the
    naive doc-id split on the same corpus), and the two splits partition
    all documents."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    rows = {r.split: r for r in qs["corpus_cluster_split"].fn(spark, SF).collect()}
    assert set(rows) == {"train", "test"}
    assert all(r.leaked_pairs == 0 for r in rows.values())
    n_docs = sum(r.n_docs for r in rows.values())
    leaky = qs["corpus_split_leakage"].fn(spark, SF).collect()
    assert any(r.leak for r in leaky)  # naive split leaks on this corpus
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )

    assert n_docs == load_table(spark, SF, "documents").count()


def test_k_anonymity_monotone_in_k(spark):
    """Privacy audit sanity: rows_at_risk and classes_below_k are
    monotone non-decreasing in k, and risk_share stays in [0, 1]."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = sorted(
        all_queries()["dq_k_anonymity"].fn(spark, SF).collect(), key=lambda r: r.k
    )
    assert [r.k for r in rows] == [2, 5, 10]
    for a, b in zip(rows, rows[1:]):
        assert b.classes_below_k >= a.classes_below_k
        assert b.rows_at_risk >= a.rows_at_risk
    assert all(0.0 <= r.risk_share <= 1.0 for r in rows)


def test_phash_neardup_catches_light_edits(spark):
    """Perceptual-hash near-dup on planted assets: a lightly-edited copy
    (one word changed in a long payload) lands within Hamming 3 of its
    original and is surfaced; an unrelated payload is not."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    base = " ".join(f"token{i} value{i}" for i in range(120))
    edited = base.replace("token57", "tokenXX")
    other = " ".join(f"zz{i} qq{i}" for i in range(120))
    assets = spark.createDataFrame(
        [(1, "image", bytearray(base.encode())),
         (2, "image", bytearray(edited.encode())),
         (3, "image", bytearray(other.encode()))],
        "asset_id long, kind string, payload binary",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in phash_neardup_pairs(assets).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(3 not in k for k in pairs)


def test_hard_negatives_never_share_label(spark):
    """Every mined negative must carry a label different from its
    anchor's, ranks are 1..k dense per anchor, and each mined pair is
    genuinely the nearest wrong-label candidate within the probed cells
    (cos monotone down the ranks)."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["sim_hard_negatives"].fn(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.n_label != r.q_label
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i].cos >= rs[i + 1].cos for i in range(len(rs) - 1))


def test_split_leakage_flags_cross_boundary_neardups(spark):
    """corpus_split_leakage on the real corpus: every row's leak flag
    equals (split_a != split_b); splits are deterministic md5 buckets; at
    least one genuine cross-split near-dup exists in the planted corpus
    (otherwise the audit would be vacuous)."""
    import hashlib

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["corpus_split_leakage"].fn(spark, SF).collect()
    assert rows

    def bucket(i: int) -> str:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return "test" if h % 10 >= 8 else "train"

    for r in rows:
        assert r.split_a == bucket(r.id_a) and r.split_b == bucket(r.id_b)
        assert r.leak == (r.split_a != r.split_b)
        assert r.jaccard >= 0.05
    assert any(r.leak for r in rows)


def test_pca_power_invariants(spark):
    """Spectral audit sanity: per component 64 unit-norm loadings
    (|‖x‖−1| < 1e-5), λ1 ≥ λ2 > 0, energy shares in (0, 1), and the two
    eigenvectors roughly orthogonal — the synthetic corpus has a
    near-flat spectrum, so 6 power steps leave residual mixing; the
    audit's value is the deterministic parity-checked state, not full
    convergence (|x1·x2| < 0.2 documents that)."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["embedding_pca_power"].fn(spark, SF).collect()
    assert len(rows) == 128
    by_c = {1: {}, 2: {}}
    lam = {}
    for r in rows:
        by_c[r.component][r.dim] = r.loading
        lam[r.component] = (r.eigenvalue, r.energy_share)
    for c in (1, 2):
        n = sum(v * v for v in by_c[c].values()) ** 0.5
        assert abs(n - 1.0) < 1e-5
        assert lam[c][0] > 0 and 0 < lam[c][1] < 1
    assert lam[1][0] >= lam[2][0]
    dot12 = sum(by_c[1][d] * by_c[2][d] for d in by_c[1])
    assert abs(dot12) < 0.2


def test_bm25_ranks_term_rich_docs_first(spark):
    """BM25 sanity on a synthetic corpus: a doc saturated with the query
    terms outranks a doc with one hit, which outranks no-hit docs (absent
    from the result); longer docs with equal tf score lower (the length
    normalization term)."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
        bm25_topk,
    )

    pad = " ".join(f"filler{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, "hash join vector hash join vector"),
            (2, f"hash {pad}"),
            (3, f"hash {pad} {pad}"),  # same tf, doubled length
            (4, pad),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bm25_topk(docs, k=10).collect()}
    assert 4 not in rows
    assert rows[1].rank == 1
    assert rows[2].bm25 > rows[3].bm25  # length normalization
    assert rows[1].bm25 > rows[2].bm25


def test_ivf_binary_recall_audit_bounds(spark):
    """Audit sanity: recall/ndcg in [0,1], n_hit <= k, one row per panel
    query; with nprobe=4/16 and pool=15 the mean recall must clear the
    coarse-code floor (>= 0.4) on the test corpus."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        q_sim_ivf_binary_recall_audit,
    )

    rows = q_sim_ivf_binary_recall_audit(spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.ndcg <= 1.0
        assert r.n_hit <= r.k == 5
    assert sum(r.recall for r in rows) / len(rows) >= 0.4
