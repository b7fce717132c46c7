"""Round-13 operator tests: PSL probe-depth derivation, crash-safe store
publishes, k-core lazy default, and the multi-probe semantic-dedup store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PSL probe depth derived from the suffix list (ADVICE r12)
# ---------------------------------------------------------------------------


def test_psl_probe_depth_follows_deepest_suffix(spark):
    """A 3-label rule (``act.edu.au``) must win over the 2-label ``com.au``
    for hosts beneath it — the fixed last-2/last-3 probe handled at most
    2-label suffixes, so swapping in a deeper list silently mis-grouped."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        with_registrable_domain,
    )

    suffixes = ("com", "au", "com.au", "edu.au", "act.edu.au")
    hosts = spark.createDataFrame(
        [
            ("www2.schools.act.edu.au",),   # 3-label rule: reg = schools.act.edu.au
            ("schools.act.edu.au",),        # reg = itself
            ("act.edu.au",),                # host IS a public suffix
            ("uni.edu.au",),                # 2-label rule still applies
            ("shop.com.au",),
            ("plain.com",),
            ("weird.zz",),                  # unknown TLD: last-two default
        ],
        "host string",
    )
    got = {
        r.host: r.reg_domain
        for r in with_registrable_domain(hosts, suffixes=suffixes).collect()
    }
    assert got == {
        "www2.schools.act.edu.au": "schools.act.edu.au",
        "schools.act.edu.au": "schools.act.edu.au",
        "act.edu.au": "act.edu.au",
        "uni.edu.au": "uni.edu.au",
        "shop.com.au": "shop.com.au",
        "plain.com": "plain.com",
        "weird.zz": "weird.zz",
    }


def test_psl_distinct_host_map_matches_per_row(spark):
    """The distinct-host + broadcast-map plan must agree with the rule
    applied per row — duplicate hosts all receive the same reg_domain."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        with_registrable_domain,
    )

    rows = [(i, h) for i, h in enumerate(
        ["news.metro.co.uk", "a.example.com", "news.metro.co.uk", "b.example.com"] * 5
    )]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = with_registrable_domain(df).collect()
    assert len(out) == len(rows)
    for r in out:
        expect = "metro.co.uk" if "metro" in r.host else "example.com"
        assert r.reg_domain == expect


# ---------------------------------------------------------------------------
# Crash-safe publish (ADVICE r12): rename-aside swap never leaves a
# previously successful publish absent
# ---------------------------------------------------------------------------


def test_publish_dir_preserves_old_content_until_swap(spark, tmp_path):
    import os

    from real_time_scraping_and_predicting_time_series_data_spark.streaming.store_compaction import (
        publish_dir,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    publish_dir(spark.range(3).selectExpr("id AS x"), store, "batch_id=0")
    assert spark.read.parquet(os.path.join(store, "batch_id=0")).count() == 3
    # overwrite publish: new content replaces old, no aside debris remains
    publish_dir(spark.range(5).selectExpr("id AS x"), store, "batch_id=0")
    assert spark.read.parquet(os.path.join(store, "batch_id=0")).count() == 5
    assert not [d for d in os.listdir(store) if d.endswith(".prev")]


def test_publish_dir_self_heals_mid_swap_crash(spark, tmp_path):
    """Simulate the crash window between rename(final→aside) and
    rename(staging→final): the next publish of the same dirname restores
    the aside before staging, so the batch is never silently absent."""
    import os

    from real_time_scraping_and_predicting_time_series_data_spark.streaming.store_compaction import (
        publish_dir,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    publish_dir(spark.range(3).selectExpr("id AS x"), store, "batch_id=7")
    final = os.path.join(store, "batch_id=7")
    aside = os.path.join(store, "_staging_batch_id_7.prev")
    os.rename(final, aside)  # the crash window state
    # replay of batch 7 self-heals and republishes
    publish_dir(spark.range(4).selectExpr("id AS x"), store, "batch_id=7")
    assert spark.read.parquet(final).count() == 4
    assert not os.path.exists(aside)


# ---------------------------------------------------------------------------
# k_core_peel lazy default (ADVICE r12)
# ---------------------------------------------------------------------------


def test_k_core_default_silent_carries_stable_flag(spark):
    """Default check_convergence=False (ADVICE r12): a non-fixpoint peel
    raises NO warning — the per-row ``stable`` flag carries the contract;
    the eager driver-side check is opt-in.  (The build itself still
    finalizes AQE stages via the lazy localCheckpoints — the 2x cost the
    default eliminates was the check's extra full-peel ACTION.)"""
    import warnings

    from real_time_scraping_and_predicting_time_series_data_spark.operators.graph import (
        k_core_peel,
    )

    # path graph: 2 rounds leave degree-1 survivors -> non-fixpoint
    pairs = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    edges = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        rows = k_core_peel(edges, k=2, rounds=2).collect()
    assert any(r.stable == 0 for r in rows)


# ---------------------------------------------------------------------------
# Multi-probe SemanticDedupStore (VERDICT r12 item 1)
# ---------------------------------------------------------------------------

DIM = 8


def _e(i, eps=0.0, j=None):
    v = [0.0] * DIM
    v[i] = 1.0
    v[(i + 1) % DIM if j is None else j] = eps
    return v


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _seed_rows():
    return [(i, _e(i)) for i in range(4)]


def _store(spark, tmp_path, nprobe, threshold=0.6, sub="s"):
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.ann_ingest import (
        seed_centroids,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.semantic_ingest import (
        SemanticDedupStore,
    )

    seeds = _vecs(spark, _seed_rows())
    return SemanticDedupStore(
        spark,
        str(tmp_path / f"{sub}_np{nprobe}"),
        seed_centroids(seeds, n_cells=4),
        threshold=threshold,
        nprobe=nprobe,
    )


def test_multiprobe_catches_cross_primary_cell_neardup(spark, tmp_path):
    """Two near-identical vectors straddling the cell-0/cell-1 boundary:
    their PRIMARY cells differ, but each probes the other's primary at
    rank 2 — single-probe admits both (the measured blind spot),
    nprobe=2 dedups them."""
    import math

    # 45-degree boundary pair: e0 + (1±delta) e1 — primary cells 0 and 1
    a = [0.0] * DIM
    a[0], a[1] = 1.0, 0.98
    b = [0.0] * DIM
    b[0], b[1] = 0.98, 1.0
    cos = (a[0] * b[0] + a[1] * b[1]) / (
        math.hypot(a[0], a[1]) * math.hypot(b[0], b[1])
    )
    assert cos > 0.99

    for nprobe, expect_both in [(1, True), (2, False)]:
        store = _store(spark, tmp_path, nprobe, sub="xc")
        store.ingest_batch(_vecs(spark, [(10, a)]), 0)
        store.ingest_batch(_vecs(spark, [(11, b)]), 1)
        served = {r.vec_id for r in store.serve().collect()}
        if expect_both:
            assert served == {10, 11}  # the single-probe blind spot
        else:
            assert served == {10}  # multi-probe first-seen-wins


def test_multiprobe_within_batch_cross_cell_collapse(spark, tmp_path):
    """The same boundary pair INSIDE one batch collapses to the min-id
    representative at nprobe=2 (the union-find spans primary cells via
    shared probe cells)."""
    a = [0.0] * DIM
    a[0], a[1] = 1.0, 0.98
    b = [0.0] * DIM
    b[0], b[1] = 0.98, 1.0
    store = _store(spark, tmp_path, 2, sub="wb")
    store.ingest_batch(_vecs(spark, [(10, a), (11, b)]), 0)
    assert {r.vec_id for r in store.serve().collect()} == {10}


def test_multiprobe_nprobe1_matches_legacy_cell_local(spark, tmp_path):
    """nprobe=1 degrades bit-exactly to the old same-primary-cell
    contract: chain collapse within a cell, cross-cell pairs admitted."""
    store = _store(spark, tmp_path, 1, threshold=0.9, sub="legacy")
    batch0 = _seed_rows() + [(100, _e(0, 0.10)), (101, _e(0, 0.14)), (102, _e(0, 0.18))]
    store.ingest_batch(_vecs(spark, batch0), 0)
    assert {r.vec_id for r in store.serve().collect()} == {0, 1, 2, 3}
    store.ingest_batch(_vecs(spark, [(200, _e(0, 0.05))]), 1)
    served = {r.vec_id for r in store.serve().collect()}
    assert 200 not in served


def test_multiprobe_replay_and_restart_idempotent(spark, tmp_path):
    """An at-least-once replay of a published batch reaches identical
    verdicts (the replay excludes its own earlier attempt from the
    ledger), and a fresh store object over the same directory serves the
    same set (restart)."""
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.ann_ingest import (
        seed_centroids,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.semantic_ingest import (
        SemanticDedupStore,
    )

    store = _store(spark, tmp_path, 2, sub="rr")
    b0 = _seed_rows()
    b1 = [(20, _e(1, 0.05)), (21, _e(2, 0.5, j=3))]
    store.ingest_batch(_vecs(spark, b0), 0)
    store.ingest_batch(_vecs(spark, b1), 1)
    before = {(r.cell, r.vec_id) for r in store.serve().collect()}
    store.ingest_batch(_vecs(spark, b1), 1)  # replay
    assert {(r.cell, r.vec_id) for r in store.serve().collect()} == before

    seeds = _vecs(spark, _seed_rows())
    reopened = SemanticDedupStore(
        spark,
        str(tmp_path / "rr_np2"),
        seed_centroids(seeds, n_cells=4),
        threshold=0.6,
        nprobe=2,
    )
    assert {(r.cell, r.vec_id) for r in reopened.serve().collect()} == before


def test_multiprobe_compaction_preserves_verdicts(spark, tmp_path):
    store = _store(spark, tmp_path, 2, sub="cp")
    store.ingest_batch(_vecs(spark, _seed_rows()), 0)
    store.ingest_batch(_vecs(spark, [(30, _e(3, 0.05))]), 1)
    before = {(r.cell, r.vec_id) for r in store.serve().collect()}
    info = store.compact()
    assert info["folded_batches"] == 2
    assert {(r.cell, r.vec_id) for r in store.serve().collect()} == before
    # a replayed folded batch is dropped (its verdicts live in the fold)
    store.ingest_batch(_vecs(spark, [(30, _e(3, 0.05))]), 1)
    assert {(r.cell, r.vec_id) for r in store.serve().collect()} == before


def test_multiprobe_served_shared_probe_invariant(spark, tmp_path):
    """The strengthened invariant: no two SERVED vectors sharing ANY
    probed cell are within tau."""
    from real_time_scraping_and_predicting_time_series_data_spark.functions.vector import (
        dot,
    )

    store = _store(spark, tmp_path, 2, threshold=0.5, sub="inv")
    rows = [(i, _e(i % 4, 0.3 + 0.1 * (i % 3))) for i in range(40)]
    for bid in range(4):
        store.ingest_batch(_vecs(spark, rows[bid * 10 : (bid + 1) * 10]), bid)
    served = store.serve()
    a = served.select(
        F.explode("probe_cells").alias("pc"),
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
    )
    b = served.select(
        F.explode("probe_cells").alias("pc"),
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
    )
    bad = (
        a.join(b, "pc")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(dot(F.col("va"), F.col("vb")), 9) >= 0.5)
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------------------
# Nested-HTML extraction (VERDICT r12 item 4)
# ---------------------------------------------------------------------------

_NESTED_HTML = (
    "<html><head><title>T</title></head><body>"
    "<nav><a href='/'>Home</a></nav>"
    "<div class='art'>outer intro "
    "<div class='inner'>nested paragraph body text</div>"
    " outer conclusion text</div>"
    "<p>closing standalone paragraph</p>"
    "</body></html>"
)


def test_html_extract_exact_on_nested_blocks(spark):
    """Boundary splitting parses <div>A<div>B</div>C</div> into the three
    text runs A/B/C — nothing truncated, nothing lost."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        html_main_content,
    )

    df = spark.createDataFrame([(1, _NESTED_HTML)], "doc_id long, html string")
    sb, kept = html_main_content(F.col("html"))
    row = df.select(sb.alias("sb"), kept.alias("keep")).collect()[0]
    plains = [x["plain"] for x in row.sb]
    assert plains == [
        "outer intro",
        "nested paragraph body text",
        "outer conclusion text",
        "closing standalone paragraph",
    ]
    assert [x["plain"] for x in row.keep] == plains  # no links -> all kept


def test_html_extract_old_span_regex_fails_nested(spark):
    """Regression pin: the r12 non-greedy span matcher truncates the outer
    div at the FIRST inner </div> (its capture still contains the inner
    opener) and drops the outer conclusion text entirely — the miss the
    boundary splitter fixes."""
    old_re = "(?s)<(?:p|div)[^>]*>(.*?)</(?:p|div)>"
    df = spark.createDataFrame([(1, _NESTED_HTML)], "doc_id long, html string")
    old_blocks = df.select(
        F.regexp_extract_all(F.col("html"), F.lit(old_re), 1).alias("bl")
    ).collect()[0].bl
    joined = " ".join(old_blocks)
    assert "outer conclusion text" not in joined  # lost by the old matcher
    assert any("<div" in b for b in old_blocks)   # truncated mid-structure


def test_html_extract_flat_body_unchanged_by_split(spark):
    """On a FLAT body the boundary splitter reproduces the old span
    matcher's blocks exactly (the in-between runs are empty and
    filtered)."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        html_main_content,
    )

    flat = (
        "<html><head><title>T</title></head><body>"
        "<p>first paragraph text</p><p>second paragraph text</p>"
        "<div>a div block</div></body></html>"
    )
    df = spark.createDataFrame([(1, flat)], "doc_id long, html string")
    sb, _ = html_main_content(F.col("html"))
    plains = [x["plain"] for x in df.select(sb.alias("sb")).collect()[0].sb]
    assert plains == ["first paragraph text", "second paragraph text", "a div block"]


def test_html_extract_head_stripped_not_header(spark):
    """<head>...</head> is boilerplate-stripped (title text never becomes
    a run) while a <header> element is still stripped by its own rule and
    the head regex cannot swallow it."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        html_main_content,
    )

    html = (
        "<html><head><title>Page Title Words</title></head><body>"
        "<header><a href='/'>masthead</a></header>"
        "<p>real content here</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    sb, _ = html_main_content(F.col("html"))
    plains = [x["plain"] for x in df.select(sb.alias("sb")).collect()[0].sb]
    assert plains == ["real content here"]


# ---------------------------------------------------------------------------
# robots.txt rules (VERDICT r12 item 6)
# ---------------------------------------------------------------------------


def test_robots_longest_prefix_wins_allow_tiebreak(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        apply_robots_rules,
        robots_rules_table,
    )

    rules = robots_rules_table(
        spark,
        (
            ("ex.com", "/a", 0),
            ("ex.com", "/a/b", 1),       # longer prefix re-allows
            ("ex.com", "/t", 0),
            ("ex.com", "/t", 1),         # exact tie: allow wins (REP tiebreak)
            ("other.org", "/", 0),       # blanket deny on another domain
        ),
    )
    df = spark.createDataFrame(
        [
            (1, "https://ex.com/a/x", "ex.com"),          # denied by /a
            (2, "https://ex.com/a/b/x", "ex.com"),        # re-allowed by /a/b
            (3, "https://ex.com/t/z", "ex.com"),          # tie -> allowed
            (4, "https://ex.com/free", "ex.com"),         # no rule -> allowed
            (5, "https://other.org/any", "other.org"),    # blanket deny
            (6, "https://norules.net/x", "norules.net"),  # domain w/o rules
        ],
        "doc_id long, canonical_url string, reg_domain string",
    )
    got = {
        r.doc_id: (r.allowed, r.matched_prefix)
        for r in apply_robots_rules(df, rules).collect()
    }
    assert got == {
        1: (False, "/a"),
        2: (True, "/a/b"),
        3: (True, "/t"),
        4: (True, None),
        5: (False, "/"),
        6: (True, None),
    }


def test_robots_filter_query_blocks_expected_share(spark):
    """On the synthesized URLs: example.com denies item-1* (111 of 200
    page keys) minus the re-allowed item-12* (11 back); sample.org denies
    item-7* (11 keys); metro.co.uk has no rules."""
    import __spark_entry__ as entry

    rows = entry.queries()["corpus_robots_filter"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r.allowed == (r.rule_allow != 0) for r in rows)
    blocked = [r for r in rows if not r.allowed]
    assert blocked, "rule set must block something"
    for r in blocked:
        assert r.matched_prefix in ("/articles/item-1", "/articles/item-7")
    # the longer allow prefix re-admits item-12x URLs
    reallowed = [
        r for r in rows if r.allowed and r.matched_prefix == "/articles/item-12"
    ]
    assert reallowed
    # metro.co.uk (no rules) is untouched
    assert all(r.allowed for r in rows if r.reg_domain == "metro.co.uk")


# ---------------------------------------------------------------------------
# Incremental forecast model store (VERDICT r12 item 7 — M2 warm-start twin)
# ---------------------------------------------------------------------------


def _feat_rows(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, x1 long, x2 long, y1 long, y2 long"
    )


_FEATS = [
    (1, i, 100 + 3 * i, 95 + 3 * i, 103 + 3 * i, 106 + 3 * i) for i in range(12)
] + [(2, 100 + i, 200 - 5 * i, 205 - 5 * i, 195 - 5 * i, 190 - 5 * i) for i in range(12)]


def test_forecast_store_incremental_equals_batch_refit(spark, tmp_path):
    """Coefficients from 3-batch merged moments == one-shot fit over the
    union — bit-exact (integer moments commute with the split)."""
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.forecast_stream import (
        ForecastGramStore,
        moment_grid,
    )

    t = _feat_rows(spark, _FEATS)
    store = ForecastGramStore(spark, str(tmp_path / "s1"))
    for bid in range(3):
        store.ingest_batch(t.filter(F.col("event_id") % 3 == bid), bid)
    inc = store.coefficients().collect()[0]

    one = ForecastGramStore(spark, str(tmp_path / "s2"))
    one.ingest_batch(t, 0)
    full = one.coefficients().collect()[0]
    assert inc == full
    # and the merged moments equal the direct one-pass grid
    merged = {r.k: r.v for r in moment_grid(t).collect()}
    served = store.serve_moments().collect()[0].asDict()
    assert served == merged


def test_forecast_store_replay_restart_compaction(spark, tmp_path):
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.forecast_stream import (
        ForecastGramStore,
    )

    t = _feat_rows(spark, _FEATS)
    d = str(tmp_path / "s")
    store = ForecastGramStore(spark, d)
    store.ingest_batch(t.filter(F.col("event_id") < 100), 0)
    store.ingest_batch(t.filter(F.col("event_id") >= 100), 1)
    before = store.coefficients().collect()
    # replay overwrites its own grid: verdicts unchanged
    store.ingest_batch(t.filter(F.col("event_id") >= 100), 1)
    assert store.coefficients().collect() == before
    # restart: a fresh object over the same dir serves the same model
    assert ForecastGramStore(spark, d).coefficients().collect() == before
    # compaction folds to 12 rows and preserves the model; a folded
    # replay is dropped
    info = store.compact()
    assert info["folded_batches"] == 2
    assert store.coefficients().collect() == before
    store.ingest_batch(t.limit(3), 1)
    assert store.coefficients().collect() == before


def test_forecast_store_empty_batch_is_identity(spark, tmp_path):
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.forecast_stream import (
        ForecastGramStore,
    )

    t = _feat_rows(spark, _FEATS)
    store = ForecastGramStore(spark, str(tmp_path / "s"))
    store.ingest_batch(t, 0)
    before = store.coefficients().collect()
    store.ingest_batch(t.filter(F.lit(False)), 1)  # empty micro-batch
    assert store.coefficients().collect() == before


def test_forecast_store_degenerate_design_empty(spark, tmp_path):
    """A singular design (constant regressors) serves an EMPTY coefficient
    relation — the ml_linear_forecast_eval det=0 guard."""
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.forecast_stream import (
        ForecastGramStore,
    )

    rows = [(1, i, 5, 5, 6, 7) for i in range(8)]  # x1 == x2 == const
    store = ForecastGramStore(spark, str(tmp_path / "s"))
    store.ingest_batch(_feat_rows(spark, rows), 0)
    assert store.coefficients().count() == 0


# ---------------------------------------------------------------------------
# Auto-K ladder (VERDICT r12 item 4): linear below the crossover, sqrt above
# ---------------------------------------------------------------------------


def test_auto_cells_ladder_branches(spark):
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        _CELL_FLOOR,
        _CELL_SQRT_C,
        _CELL_TARGET,
        auto_cells,
    )

    def expect(n):
        return max(
            _CELL_FLOOR,
            math.ceil(min(n / _CELL_TARGET, _CELL_SQRT_C * math.sqrt(n))),
        )

    # the measured anchor points: sf0.01 -> 4, sf0.1 -> 16 (linear branch,
    # unchanged from r12), sf1x -> 57 (sqrt branch)
    assert expect(500) == 4
    assert expect(2000) == 16
    assert expect(20000) == 57
    # crossover at N = (target * c)^2 = 2500 — the two rules agree there
    assert expect(2500) == math.ceil(0.4 * math.sqrt(2500)) == 20
    # sqrt branch caps the linear blow-up at 100x
    assert expect(2_000_000) < 2_000_000 // _CELL_TARGET
    # auto_cells agrees with the closed form on a real DataFrame
    df = spark.range(2000)
    assert auto_cells(df) == expect(2000)


def test_auto_cells_sql_twin_matches_python(spark):
    """The DuckDB scalar subquery computes the same K as auto_cells for a
    grid of corpus sizes — the IEEE double chain must agree exactly."""
    import math

    import duckdb

    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        _CELL_FLOOR,
        _CELL_SQRT_C,
        _CELL_TARGET,
    )

    con = duckdb.connect()
    for n in [1, 50, 499, 500, 501, 1250, 2000, 2499, 2500, 2501,
              5000, 20000, 31250, 123457, 1000000]:
        sql = (
            f"SELECT GREATEST({_CELL_FLOOR}, CAST(ceil(LEAST({n} / "
            f"{_CELL_TARGET}.0, {_CELL_SQRT_C} * sqrt({n}))) AS INT))"
        )
        k_sql = con.execute(sql).fetchone()[0]
        k_py = max(
            _CELL_FLOOR,
            math.ceil(min(n / _CELL_TARGET, _CELL_SQRT_C * math.sqrt(n))),
        )
        assert k_sql == k_py, (n, k_sql, k_py)


# ---------------------------------------------------------------------------
# GEMM relation serve (r13 ladder rung) — agreement with the fold path
# ---------------------------------------------------------------------------


def test_gemm_relation_serve_matches_fold_path(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        ivf_topk_relation,
        ivf_topk_relation_gemm,
    )

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    kw = dict(k=3, n_cells=4, nprobe=2)
    fold = sorted(map(tuple, ivf_topk_relation(emb, queries, **kw).collect()))
    gemm = sorted(map(tuple, ivf_topk_relation_gemm(emb, queries, **kw).collect()))
    assert fold == gemm


def test_gemm_probe_rows_shape_and_order(spark):
    """nprobe rows per vector, rn in probe order, primary == ivf_assign."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        _gemm_cell_rows,
        ivf_assign,
    )

    rows = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("c_nvec")
    )
    out = _gemm_cell_rows(df, cents, "v", "vec_id", 2).collect()
    assert len(out) == 12  # 2 rows per vector
    primary = {r.vec_id: r.cell for r in out if r.rn == 1}
    fold_primary = {
        r.vec_id: r.cell
        for r in ivf_assign(df, cents, "v", ["vec_id"]).select("vec_id", "cell").collect()
    }
    assert primary == fold_primary
    # vectors carried through intact
    assert all(len(r.v) == 8 for r in out)


# ---------------------------------------------------------------------------
# sitemap discovery (r13)
# ---------------------------------------------------------------------------


def test_sitemap_discovery_counts(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["corpus_sitemap_discovery"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_listed == 160            # 150 candidate-known + 10 new keys
        assert r.n_known + r.n_new == r.n_listed
        assert r.n_new >= 10                # the never-crawled keys are always new
        assert r.n_known >= 0
    # at least one host must recognize some listed page from the crawl
    assert any(r.n_known > 0 for r in rows)


def test_discovery_frontier_composition(spark):
    """Robots composition: example.com's item-1 deny blocks its whole
    item-1000.. discovery payload; slots are dense per host starting at
    0; fetch offsets follow the per-domain delay."""
    import __spark_entry__ as entry

    rows = entry.queries()["pipeline_discovery_frontier"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
        # example.com discovery keys all start with item-1 -> robots-denied
        assert not (r.reg_domain == "example.com" and r.page_key >= 1000)
        delay = 10 if r.reg_domain == "sample.org" else 5
        assert r.fetch_offset_s == r.slot * delay
    for host, hr in by_host.items():
        slots = sorted(x.slot for x in hr)
        assert slots == list(range(len(hr)))
    # sample.org / metro hosts DO receive discovery keys
    assert any(r.page_key >= 1000 for r in rows)
