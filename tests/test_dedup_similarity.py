"""Property tests for the non-SQL-expressible dedup/similarity operators
(SURVEY.md §5.5): LSH candidates vs exact baselines on synthetic corpora
with planted near-duplicates."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_candidates,
    minhash_signatures,
    shingle_sets,
    simhash,
    simhash_pairs,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

VOCAB = [f"w{i}" for i in range(200)]


def _corpus(spark, n_docs=30, n_dups=8, seed=7):
    """Random docs + planted near-duplicates (1-word edit of an original)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(60)]
        rows.append((i, " ".join(words), "s0"))
    for j in range(n_dups):
        base = list(rows[j][1].split())
        base[5] = rng.choice(VOCAB)  # one-word edit -> jaccard ~0.9
        rows.append((n_docs + j, " ".join(base), "s0"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "x y")], "doc_id long, text string"
    )
    out = {r.keep_id: r.n_copies for r in exact_dedup(df).collect()}
    assert out == {0: 2, 2: 1}


def test_minhash_recall_on_planted_dups(spark):
    docs = _corpus(spark)
    truth = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(docs, block=None, n=2, threshold=0.7).collect()
    }
    assert len(truth) >= 6  # the planted pairs are found by the exact op
    sigs = minhash_signatures(shingle_sets(docs, n=2), num_perm=16)
    cands = {(r.id_a, r.id_b) for r in minhash_candidates(sigs, 16, bands=4).collect()}
    # banding with 4 bands of 4 rows: P(candidate) = 1-(1-j^4)^4 -> ~0.97 at j=0.9
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.8, f"minhash recall {recall} over {len(truth)} true pairs"


def test_minhash_no_false_certainty(spark):
    """Candidates are a CANDIDATE set: verification (exact jaccard) is what
    asserts near-dupness. Unrelated docs' jaccard stays low."""
    docs = _corpus(spark, n_dups=0)
    sigs = minhash_signatures(shingle_sets(docs, n=2), num_perm=16)
    cands = minhash_candidates(sigs, 16, bands=4)
    verified = cands.join(
        jaccard_pairs(docs, block=None, n=2, threshold=0.5).select("id_a", "id_b"),
        ["id_a", "id_b"],
        "inner",
    )
    assert verified.count() == 0


def test_simhash_separates_dups_from_random(spark):
    docs = _corpus(spark)
    fps = simhash(docs)
    # bands=16 (4-bit chunks): pigeonhole-guaranteed recall up to hamming 15,
    # far above the planted pairs' distances.
    pairs = simhash_pairs(fps, max_hamming=63, bands=16).collect()
    planted = {(j, 30 + j) for j in range(8)}
    ham = {(r.id_a, r.id_b): r.hamming for r in pairs}
    planted_ham = [ham[p] for p in planted if p in ham]
    other_ham = [h for p, h in ham.items() if p not in planted]
    assert len(planted_ham) == 8
    assert max(planted_ham) <= 12  # one-word edit moves few bits
    if other_ham:  # random pairs that collided on a band
        assert min(other_ham) > max(planted_ham)


def test_simhash_banding_pigeonhole_guarantee(spark):
    """Hamming < bands ⇒ pair is always a candidate (exact guarantee)."""
    docs = _corpus(spark)
    fps = simhash(docs)
    all_pairs = simhash_pairs(fps, max_hamming=3, bands=16).collect()
    # brute force check: every pair at hamming<=3 must appear
    rows = fps.collect()
    import itertools

    want = set()
    for a, b in itertools.combinations(sorted(rows, key=lambda r: r.id), 2):
        d = bin(a.simhash ^ b.simhash).count("1")
        if d <= 3:
            want.add((a.id, b.id))
    got = {(r.id_a, r.id_b) for r in all_pairs}
    assert want <= got


def test_lsh_topk_subset_of_bruteforce_scores(spark):
    """Every ANN result must carry the same cosine the exact operator
    computes, and per-query ranks must be 1..k without gaps in cos order."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = brute_force_topk(emb, queries, k=50)
    ann = lsh_topk(emb, queries, k=5, bits=4)
    joined = ann.alias("a").join(
        bf.alias("b"),
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.neighbor_id") == F.col("b.neighbor_id")),
        "left",
    )
    rows = joined.select("a.query_id", "a.neighbor_id", "a.cos", "b.cos").collect()
    for r in rows:
        if r[3] is not None:  # appears in exact top-50: scores must agree
            assert r[2] == pytest.approx(r[3], abs=1e-9)
    # ranks contiguous per query
    by_q = {}
    for r in ann.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
    for q, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))


def test_bruteforce_topk_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=float) for r in pdf.itertuples()}
    queries = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = [
        (r.neighbor_id, r.cos)
        for r in brute_force_topk(emb, queries, k=3).orderBy("rank").collect()
    ]
    q = vecs[3]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != 3
    }
    want = sorted(sims.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:3]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-6)


def test_lsh_multiprobe_improves_recall(spark):
    """Multi-probe must strictly widen the candidate set and not hurt
    recall@5 vs brute force."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(multi):
        ann = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(emb, queries, k=5, bits=4, multi_probe=multi).collect()
        }
        return len(bf & ann) / len(bf)

    r_single, r_multi = recall(False), recall(True)
    assert r_multi >= r_single
    assert r_multi >= 0.4, (r_single, r_multi)


def test_ivf_topk_recall_and_score_parity(spark):
    """IVF ANN: scores must equal the exact operator's cosines for shared
    pairs, and probing 4/16 cells must keep recall@5 usable (>= 0.5)."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r.query_id, r.neighbor_id): r.cos
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    ann = ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4).collect()
    for r in ann:
        if (r.query_id, r.neighbor_id) in bf:
            assert r.cos == pytest.approx(bf[(r.query_id, r.neighbor_id)], abs=1e-9)
    hits = sum((r.query_id, r.neighbor_id) in bf for r in ann)
    recall = hits / len(bf)
    assert recall >= 0.5, f"IVF recall@5 {recall}"


def test_ivf_cells_partition_corpus(spark):
    """Every corpus vector lands in exactly one cell and cells are 0..K-1."""
    from real_time_scraping_and_predicting_time_series_data_spark.functions.vector import (
        as_double,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        ivf_assign,
        ivf_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c = emb.select(F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("v_c"))
    cents = ivf_train(c, "v_c", "neighbor_id", k=8)
    assigned = ivf_assign(c, cents, "v_c", ["neighbor_id"])
    n_corpus = c.count()
    assert assigned.count() == n_corpus
    assert assigned.select("neighbor_id").distinct().count() == n_corpus
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_jaccard_singleton_pruning_preserves_results(spark):
    """The df>=2 pruning knob must not change any pair or score."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        (r.id_a, r.id_b): (r.n_common, round(r.jaccard, 9))
        for r in jaccard_pairs(docs, block="source", n=3, threshold=0.05).collect()
    }
    pruned = {
        (r.id_a, r.id_b): (r.n_common, round(r.jaccard, 9))
        for r in jaccard_pairs(
            docs, block="source", n=3, threshold=0.05, prune_singletons=True
        ).collect()
    }
    assert base == pruned and len(base) > 0


def test_embedding_banded_recall_vs_unblocked(spark):
    """SRP-band blocking must recover ≥95% of the unblocked all-pairs ground
    truth at the registered threshold, with zero false positives (exact
    cosine verifies every candidate)."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_banded,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    truth = {
        (r.id_a, r.id_b): round(r.cos, 6)
        for r in embedding_dup_pairs(emb, block=None, threshold=0.4).collect()
    }
    blocked = {
        (r.id_a, r.id_b): round(r.cos, 6)
        for r in embedding_dup_pairs_banded(emb, threshold=0.4).collect()
    }
    assert len(truth) > 0
    assert set(blocked) <= set(truth)  # no false positives
    recall = len(blocked) / len(truth)
    assert recall >= 0.95, f"banded recall {recall:.3f} over {len(truth)} pairs"
    for pair, c in blocked.items():
        assert truth[pair] == c  # scores identical where recovered


def test_connected_components_handcrafted(spark):
    """Chain, triangle-with-bridge, and isolated nodes all label with the
    component minimum; propagation must cross multi-hop chains."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (12, 13)],
        "src BIGINT, dst BIGINT",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (1, 2, 3, 4, 10, 11, 12, 13, 99)], "id BIGINT"
    )
    got = {r.node: r.label for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 99: 99}


def test_containment_detects_subset_duplicate(spark):
    """A short doc fully quoted inside a long one: containment(short→long)
    = 1.0 even though Jaccard is far below any dedup threshold."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short, "s"), (2, filler + " " + short + " " + filler, "s")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    jac = jaccard_pairs(docs, block="source", n=3, threshold=0.0).collect()
    assert all(r.jaccard < 0.1 for r in jac)


def test_prefix_filter_hot_shingle_skew_stress(spark):
    """Skew stress for the PPJoin path: a boilerplate shingle present in
    EVERY document must not explode candidate volume — its corpus-wide df
    ranks it LAST in the rarest-first prefix order, so it never enters a
    prefix and the hot-token df² term collapses. Candidates stay exactly
    the planted near-dup pairs; the join remains lossless vs brute force."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_prefix_filter_pairs,
        prefix_filter_candidates,
        shingles,
    )

    # 120 docs all sharing the same leading boilerplate (every 3-gram of
    # which is corpus-hot), each followed by enough unique filler that the
    # rarest-first prefix (floor(sz/2)+1 grams at tau=0.5) is covered by
    # rare grams alone — the prefix lemma then guarantees the hot grams
    # stay OUT of every prefix. 3 planted near-dup pairs share their
    # filler too (J = 13/15), so they still collide in-prefix.
    boiler = "terms of service apply to all users"
    uniq = lambda i: " ".join(f"unique{i}{c}" for c in "abcdefgh")  # noqa: E731
    rows = [(i, f"{boiler} {uniq(i)}") for i in range(120)]
    for j, base in enumerate((200, 210, 220)):
        filler = " ".join(f"shared{j}{c}" for c in "abcdefgh")
        rows.append((base, f"{boiler} {filler} x{j}"))
        rows.append((base + 1, f"{boiler} {filler} y{j}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = docs.select("doc_id", shingles(F.col("text"), 3).alias("grams"))
    n_cands = prefix_filter_candidates(sh, tau=0.5).count()
    n_docs = docs.count()
    all_pairs = n_docs * (n_docs - 1) // 2  # 7875
    # the hot boilerplate grams would have produced ~all_pairs candidates;
    # prefix filtering must keep candidates within a few dozen
    assert n_cands < 50, (n_cands, all_pairs)

    got = {
        (r.id_a, r.id_b)
        for r in jaccard_prefix_filter_pairs(docs, tau=0.5, n=3).collect()
    }
    want = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in jaccard_pairs(
            docs, block=None, n=3, threshold=0.5
        ).collect()
    }
    assert want, "planted near-dups must be above threshold"
    assert got == want  # lossless under skew


def test_semantic_clusters_catch_planted_dups_within_cluster(spark):
    """Cluster-pruned semantic dedup: a planted near-duplicate of a
    centroid-adjacent vector must be caught (same cluster, cosine above
    tau); two vectors near DIFFERENT centroids must never be paired even
    if moderately similar — the deliberate recall boundary of cluster
    pruning."""
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.functions.vector import (
        as_double,
        norm,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        ivf_assign,
    )

    dim = 8
    e = lambda i: [1.0 if j == i else 0.0 for j in range(dim)]  # noqa: E731
    rows = [(i, e(i)) for i in range(4)]  # 4 seed centroids (vec_id < 4)
    # 100: near-dup of axis-0 (cos ~0.995 with centroid 0 axis)
    rows.append((100, [1.0, 0.1] + [0.0] * (dim - 2)))
    # 101: second vector in cluster 0, nearly identical to 100
    rows.append((101, [1.0, 0.11] + [0.0] * (dim - 2)))
    # 200: belongs to cluster 1, moderately similar to 100/101 but pruned
    rows.append((200, [0.5, 1.0] + [0.0] * (dim - 2)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    c = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    c = c.withColumn("_n", norm(F.col("v"))).select(
        "vec_id", F.transform("v", lambda x: x / F.col("_n")).alias("v")
    )
    cents = c.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("c_nvec")
    )
    assigned = {r.vec_id: r.cell for r in ivf_assign(c, cents, "v", ["vec_id"]).collect()}
    assert assigned[100] == 0 and assigned[101] == 0
    assert assigned[200] == 1

    from real_time_scraping_and_predicting_time_series_data_spark.functions.vector import dot

    a = ivf_assign(c, cents, "v", ["vec_id"])
    pairs = (
        a.select("cell", F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
        .join(a.select("cell", F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dot(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.9)
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (100, 101) in got          # planted near-dup caught in-cluster
    assert all(200 not in p for p in got)  # cross-cluster pair pruned
    # sanity: 100 vs 200 raw cosine is actually moderately high
    v100 = [1.0, 0.1] + [0.0] * 6
    v200 = [0.5, 1.0] + [0.0] * 6
    num = sum(x * y for x, y in zip(v100, v200))
    cos = num / (math.sqrt(sum(x * x for x in v100)) * math.sqrt(sum(x * x for x in v200)))
    assert cos > 0.5


def test_kmeans_lloyd_exact_recovers_planted_clusters(spark):
    """Two tight planted clusters + seeds inside each: Lloyd converges to
    the cluster means (exact-arithmetic update), every point lands with
    its own cluster, and inertia is the within-cluster spread."""
    import random

    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        kmeans_lloyd_exact,
    )

    rng = random.Random(7)
    rows = []
    for i in range(40):
        center = 5.0 if i % 2 else -5.0
        v = [center + rng.uniform(-0.1, 0.1) for _ in range(8)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = kmeans_lloyd_exact(emb, k=2, iters=3, dim=8)
    got = {r.vec_id: r.cell for r in assigned.collect()}
    # seeds: vec 0 (center -5) -> cell 0, vec 1 (center +5) -> cell 1
    for i, cell in got.items():
        assert cell == (1 if i % 2 else 0)
    cs = {r.cell: r.c for r in cents.collect()}
    assert abs(cs[0][0] + 5.0) < 0.2 and abs(cs[1][0] - 5.0) < 0.2
