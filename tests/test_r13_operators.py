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
