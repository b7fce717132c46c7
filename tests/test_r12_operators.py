"""Round-12 operators: k-core convergence warning, auto-sized ANN
quantizers, PSL registrable domains, HTML main-content extraction,
cross-cell dedup audit, and the ADVICE r11 degenerate-key guards."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
    all_queries,
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def _q(name):
    return all_queries()[name].fn


# ---------------------------------------------------------------------------
# k-core: non-fixpoint warning (ADVICE r11 / VERDICT r11 item 9)
# ---------------------------------------------------------------------------


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_k_core_warns_on_non_fixpoint(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.graph import (
        k_core_peel,
    )

    # path 0-1-...-11 with k=2: each round peels only the two endpoints,
    # so 2 rounds leave interior nodes of degree 1 → stable=0 survivors.
    path = _sym_edges(spark, [(i, i + 1) for i in range(11)])
    with pytest.warns(RuntimeWarning, match="fixpoint not reached"):
        out = k_core_peel(path, k=2, rounds=2, check_convergence=True)
    rows = out.collect()
    assert any(r.stable == 0 for r in rows)


def test_k_core_silent_on_fixpoint(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.graph import (
        k_core_peel,
    )

    # triangle: already a 2-core; one round reaches the fixpoint.
    tri = _sym_edges(spark, [(0, 1), (1, 2), (0, 2)])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        rows = k_core_peel(tri, k=2, rounds=1, check_convergence=True).collect()
    assert {(r.node, r.core_degree, r.stable) for r in rows} == {
        (0, 2, 1),
        (1, 2, 1),
        (2, 2, 1),
    }


# ---------------------------------------------------------------------------
# degenerate-key guards (ADVICE r11): per-key AR(2) fit and Yule-Walker
# ---------------------------------------------------------------------------


def test_per_key_fit_skips_singular_design(spark, tmp_path):
    """A constant per-user series makes x1 == x2 (singular Gram, det = 0);
    the grouped-map fit must SKIP that (key, step) — pre-fix it raised
    ZeroDivisionError and crashed the whole query (ADVICE r11).  Crafted
    sf_dir: user 1 varies (fits), user 2 is constant (skipped)."""
    rows = [
        (i, 1, "view", float(i % 7 + 1) + 0.25 * (i % 3), "{}")
        for i in range(30)
    ]
    rows += [(100 + i, 2, "view", 5.0, "{}") for i in range(30)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60 + 1))
    ev.select("event_id", "ts", "user_id", "event_type", "value", "props").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = _q("ml_per_key_forecast_eval")(spark, str(tmp_path)).collect()
    assert {r.user_id for r in out} == {1}  # singular key dropped, no crash
    assert all(r.rmse is not None for r in out)


def test_yule_walker_filters_degenerate_keys(spark):
    rows = _q("ml_yule_walker_ar2")(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    assert all(r.gamma0 is not None and r.gamma0 > 0 for r in rows)
    assert all(r.rho1 is not None for r in rows)


# ---------------------------------------------------------------------------
# PSL registrable domain + case-insensitive tracking params (r12 / ADVICE)
# ---------------------------------------------------------------------------


def test_psl_longest_suffix_wins(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        with_registrable_domain,
    )

    hosts = spark.createDataFrame(
        [
            ("a.b.example.com",),
            ("news.metro.co.uk",),
            ("metro.co.uk",),
            ("co.uk",),            # host IS a public suffix: falls back to itself
            ("weird.zz",),         # unknown TLD: default last-two-labels rule
            ("x.ac.uk",),
        ],
        "host string",
    )
    got = {r.host: r.reg_domain for r in with_registrable_domain(hosts).collect()}
    assert got == {
        "a.b.example.com": "example.com",
        "news.metro.co.uk": "metro.co.uk",
        "metro.co.uk": "metro.co.uk",
        "co.uk": "co.uk",
        "weird.zz": "weird.zz",
        "x.ac.uk": "x.ac.uk",
    }


def test_canonical_url_strips_mixed_case_tracking_params(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        canonical_url,
    )

    df = spark.createDataFrame(
        [
            ("https://h.example.org/p?UTM_Source=x&b=2",),
            ("https://h.example.org/p?FBCLID=zzz&b=2",),
            ("https://h.example.org/p?b=2",),
        ],
        "url string",
    )
    canon, _ = canonical_url(F.col("url"))
    got = {r[0] for r in df.select(canon).collect()}
    assert got == {"https://h.example.org/p?b=2"}


def test_url_dedup_groups_multilabel_suffix_domains(spark):
    rows = _q("corpus_url_canonical_dedup")(spark, SF_CORRECT).collect()
    doms = {r.reg_domain for r in rows}
    assert "metro.co.uk" in doms   # PSL rule, not last-two-labels 'co.uk'
    assert "co.uk" not in doms


# ---------------------------------------------------------------------------
# HTML main-content extraction (r12)
# ---------------------------------------------------------------------------


def test_html_extract_drops_boilerplate_keeps_content(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        html_main_content,
    )

    html = (
        "<html><head><style>.x{}</style><script>var a=1;</script></head>"
        "<body><nav><a href='/'>Home</a></nav>"
        "<p>real article text with many plain words here</p>"
        "<div class='rel'><a href='/a'>link one</a> <a href='/b'>link two</a> x</div>"
        "<footer><a href='/p'>Privacy</a></footer></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    sb, kept = html_main_content(F.col("html"))
    row = df.select(
        F.size(sb).alias("nb"),
        F.size(kept).alias("nk"),
        F.transform(kept, lambda x: x["plain"]).alias("plains"),
    ).collect()[0]
    assert row.nb == 2          # nav/footer containers stripped before blocking
    assert row.nk == 1          # link farm dropped by density
    assert row.plains == ["real article text with many plain words here"]


def test_html_extract_query_variant_classes(spark):
    rows = _q("corpus_html_extract")(spark, SF_CORRECT).collect()
    assert len(rows) == 500
    # r13 nested synth: the %3==1 class has no related box (2 blocks, both
    # kept); the others carry the nested box = 2 extra runs (link farm +
    # teaser), of which the teaser survives the density gate — 4 blocks,
    # 3 kept.  The old flat-span matcher would have truncated the box at
    # the inner </div> and never seen the teaser.
    by_cls_blocks = {r.doc_id % 3: r.n_blocks for r in rows}
    by_cls_kept = {r.doc_id % 3: r.n_kept for r in rows}
    assert by_cls_blocks[1] == 2 and by_cls_blocks[0] == 4 and by_cls_blocks[2] == 4
    assert by_cls_kept[1] == 2 and by_cls_kept[0] == 3 and by_cls_kept[2] == 3
    assert all(r.main_chars > 0 and r.main_md5 is not None for r in rows)


# ---------------------------------------------------------------------------
# cross-cell near-dup audit (r12)
# ---------------------------------------------------------------------------


def test_cross_cell_audit_monotone_coverage(spark):
    rows = {r.nprobe: r for r in _q("dedup_cross_cell_audit")(spark, SF_CORRECT).collect()}
    assert set(rows) == {1, 2, 4}
    n_pairs = {r.n_true_pairs for r in rows.values()}
    assert len(n_pairs) == 1 and n_pairs.pop() > 0  # same ground truth per row
    # coverage is monotone in nprobe; primary-cell coverage IS nprobe=1
    assert rows[1].n_covered <= rows[2].n_covered <= rows[4].n_covered
    assert rows[1].n_same_primary == rows[1].n_covered
    for r in rows.values():
        assert r.n_missed == r.n_true_pairs - r.n_covered
        assert 0.0 <= r.missed_rate <= 1.0
    # the blind spot is real at nprobe=1 on this corpus
    assert rows[1].n_missed > 0


# ---------------------------------------------------------------------------
# end-to-end crawl pipeline funnel (r12)
# ---------------------------------------------------------------------------


def test_crawl_pipeline_funnel_monotone(spark):
    rows = _q("pipeline_crawl_corpus")(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    for r in rows:
        assert (
            r.n_crawled
            >= r.n_url_unique
            >= r.n_robots_ok
            >= r.n_quality
            >= r.n_content_unique
        )
        assert r.n_url_unique > 0
    # the URL tier must actually collapse something somewhere
    assert any(r.n_crawled > r.n_url_unique for r in rows)
    # the robots tier (r13) must actually block something somewhere
    assert any(r.n_url_unique > r.n_robots_ok for r in rows)
