"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is materialized via the noop sink (full execution, no driver
collect cost). A small warmup query amortizes JVM/codegen startup so the
numbers reflect steady-state engine throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries
from real_time_scraping_and_predicting_time_series_data_spark.session import (
    get_spark,
    release_persisted_rdds,
)

# Representative of the engine's surface: the reference pipeline (flagship,
# asof, windows), relational core (agg/join/window/topk), and the
# LLM-pipeline extensions (dedup/similarity/text) as they land.
HEADLINE = [
    "flagship_top_movers",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "asof_join_click_purchase",
    "asof_fifo_forecast_alignment",
    "ts_sliding_features_lags",
    "window_rank_orders_per_customer",
    "agg_distinct_counts",
    "sort_limit_global_topk",
    "dedup_minhash_pairs",
    "sim_bruteforce_topk",
    "text_quality_scores",
    "text_tfidf",
    "ts_ewma",
    "ts_resample_gapfill",
    "q10_returned_items",
    "dedup_jaccard_pairs",
    "skew_salted_join",
    "q6_revenue_forecast",
    "q13_order_count_histogram",
    "q21_waiting_supplier",
    "range_join_purchase_errors",
    "ts_hypertable_rollup",
    "text_token_stats",
    "funnel_three_stage",
    "retention_cohorts",
    "ts_anomaly_zscore",
    "sketch_cms_heavy_hitters",
    "sketch_hll_distinct",
    "ts_gaps_islands",
    "pipeline_clean_corpus",
    # r2 additions: families most likely to regress under the blocking /
    # recurrence rework, plus one more TPC-H deep shape.
    "sim_ivf_topk",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "ts_cusum_drift",
    "q8_market_share",
    # r2 additions: corpus-construction family + nearest as-of + seasonal
    # decomposition (new surface this round).
    "corpus_vocabulary",
    "corpus_token_entropy",
    "corpus_pack_budget_bins",
    "asof_join_nearest",
    "ts_seasonal_decompose",
    "corpus_source_mixture_fraction",
    "ts_feature_matrix",
    "ts_mad_outliers",
    "ml_error_metrics",
    "ml_quantile_binning",
    # r3 additions: tick-bar analytics + corpus-quality packs, and the
    # newly oracle-checked LSH family.
    "ts_ohlc_vwap_bars",
    "ts_max_drawdown",
    "events_sessionize",
    "corpus_chunk_overlap",
    "corpus_lm_perplexity",
    "embedding_int8_quantize",
    "events_key_skew_profile",
    "sim_lsh_topk",
    "pipeline_pretraining_corpus",
    # r4 additions: the oracle-checked IVF serving path + the new operator
    # families most likely to regress (folds, HOF pipelines, iterative
    # joins).
    "sim_ivf_topk_seeded",
    "ts_kalman_filter_1d",
    "ts_changepoint_cusum_segments",
    "text_winnow_fingerprint",
    "graph_copurchase_pagerank",
    "embedding_pq_codebook",
    "sketch_bloom_membership",
    "corpus_dedup_pipeline_report",
    "dedup_char_ngram_jaccard",
    "ts_sax_words",
    "stats_ks_drift",
    "ts_anomaly_stl_residual",
    "events_top_paths",
    "text_normalize_dedup_uplift",
    "ts_lttb_downsample",
    "ts_dtw_pairs",
    # r4 second wave: compressed-domain ANN serving, graph structure
    # mining, rank-based drift, robust trend.
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "graph_triangle_counts",
    "stats_mann_whitney",
    "ts_theil_sen",
    "dq_benford_totalprice",
    "stats_chi_square_contingency",
    "ml_forecast_intervals",
    "dedup_containment_pairs",
    "events_inter_arrival_stats",
    "text_keywords_topk",
    "funnel_conversion_lag",
    "ml_point_in_time_features",
    "events_markov_stationary",
    "corpus_bigram_pmi",
    "dq_schema_profile",
    "orders_basket_lift",
    "events_calendar_heatmap",
    "ts_week_over_week",
    "text_readability_scores",
    # r5 additions: rank/resampling statistics, the Newton-step domain
    # classifier, and cross-doc boilerplate detection.
    "stats_spearman_corr",
    "corpus_boilerplate_ngrams",
    "ml_logistic_newton",
    "stats_bootstrap_ci",
    "events_value_quantiles_grid",
    "ml_calibration_bins",
    "ts_ewma_irregular",
    "corpus_zipf_slope",
    "corpus_temperature_mixture",
    "graph_kcore_peel",
    "stats_welch_ttest",
    "text_ngram_novelty",
    "udf_arrow_batch_map",
    "ts_hampel_filter",
    "stats_mutual_info",
    "orders_rfm_segments",
    "events_poisson_burst",
    "ts_bollinger_bands",
    "ts_rsi",
    "ts_macd",
    "dedup_jaccard_prefix_filter",
    "stats_psi_drift",
    "events_kaplan_meier",
    "orders_revenue_concentration",
    "dq_referential_integrity",
    "corpus_classifier_filter",
    "corpus_span_corruption",
    "embedding_knn_probe",
    # r5 wave 2: graph mining, hubness audit, relational Naive Bayes.
    "graph_adamic_adar",
    "graph_bfs_hops",
    "embedding_hubness",
    "ml_naive_bayes_text",
    "stats_kendall_tau",
    "stats_js_divergence",
    "corpus_domain_cap",
    "sim_mmr_select",
    "embedding_centroid_drift",
    "ts_cross_correlation",
    "ts_granger_lag_f",
    "ts_ljung_box",
    "ts_periodogram",
    "ts_var_es",
    "ml_learning_curve",
    "text_duplicate_spans",
    "ts_forecast_reconciliation",
    "dq_freshness_lag",
    "stats_xi_correlation",
    "ts_hurst_rs",
    "events_session_likelihood",
    "events_dau_wau_stickiness",
    "orders_price_elasticity",
    "ts_wavelet_energy",
    "events_cohort_ltv",
    "stats_hill_tail_index",
    "orders_fulfillment_cycle",
    "events_markov_attribution",
    "sim_rrf_fusion",
    "ml_conformal_forecast",
    "graph_assortativity",
    "orders_open_backlog",
    "stats_runs_test",
    "corpus_tokenizer_fertility",
    "ml_naive_bayes_confusion",
    "corpus_inspection_pack",
    "orders_abc_classes",
    "corpus_oov_rate",
    "graph_rich_club",
    "corpus_diversity_indices",
    "graph_brand_modularity",
    "stats_jarque_bera",
    "ts_pacf",
    # r7 additions: stationarity/regime diagnostics + the incremental
    # df-index serve demo.
    "ts_spectral_entropy",
    "ts_permutation_entropy",
    "ts_adf_unit_root",
    "ts_turning_points",
    "dedup_semantic_clusters",
    "ts_seasonal_strength",
    "corpus_bpe_first_merges",
    "ml_kmeans_summary",
    # r7 session waves: classifier-eval panel, group-comparison suite,
    # schema-discovery profilers.
    "ml_roc_auc",
    "ml_pr_auc",
    "ml_isotonic_calibration",
    "stats_anova_oneway",
    "stats_levene_brown_forsythe",
    "stats_cramers_v",
    "dq_inclusion_dependencies",
    "dq_functional_dependencies",
    "orders_frequent_triples",
    "sql_lateral_topk",
    "ml_roc_auc_stream_serve",
    "dedup_cdc_chunks",
    "corpus_bigram_llr",
    "embedding_silhouette",
    "stats_two_proportion_z",
    "stats_fdr_bh",
    "stats_permutation_test",
    "dedup_fuzzy_orders",
    "sketch_hll_md5",
    "ml_harmonic_regression",
    "graph_clustering_coefficient",
    "ml_ks_separation",
    "ml_cumulative_gains",
    "stats_experiment_stream_serve",
    "ts_croston_forecast",
    "source_tick_batch",
    "source_tick_stream_serve",
    "udtf_word_chunks",
    "ml_boosted_stumps",
    "ts_theta_forecast",
]
# r8: the curated list above is the ORDER; coverage is by construction —
# main() appends every oracle-bearing registry query not already listed
# (alphabetical), so bench count == oracle count permanently (the r7
# verdict found 114 oracle-bearing queries, mostly sub-second relational
# shapes, absent from the headline set; a hand-maintained list drifts).

# Per-query repetitions: single runs at ~1-second magnitudes smear with
# environment noise (r3's uniform +9% drift); the median of N runs makes
# real regressions stand out. First run of each query additionally absorbs
# its plan compilation.
RUNS = 3

# r9 (re-derived from the r9 anchor bench_runs_r9.json): queries that get 5 runs instead of 3.  The intra-session environment
# drift band (SCALE.md r7: 1.2-1.9x on untouched queries) is the dominant
# error on every cross-round trend claim, and it is concentrated where
# medians are large.  Selection rule, mechanical, from the r7 driver
# samples in bench_runs_r8_1.json: top-20 by excess-spread impact
# (spread-1)*median, plus every query with median >= 2.5 s, plus the r7
# verdict's named movers.  Re-derive each round from the round-stamped
# samples file.
HIGH_VARIANCE = frozenset({
    # r12 additions by the median >= 2.5 s rule (scoped r12 samples:
    # bench_runs_r12_{3,4,5}.json): the auto-K relation serves stay in the
    # set via their existing entries; these are the new multi-second rows.
    "corpus_frontier_stream_serve",
    "dedup_cross_cell_audit",
    "sim_topk_relation_lloyd",
    "sim_pq_relation_topk",
    "sim_hard_negatives",
    "corpus_boilerplate_ngrams",
    "corpus_dedup_pipeline_report",
    "corpus_df_index_serve",
    "dedup_char_ngram_jaccard",
    "dedup_clusters_star",
    "dedup_clusters_stopgram",
    "dedup_containment_pairs",
    "dedup_duplicate_clusters",
    "dedup_embedding_cosine",
    "dedup_jaccard_pairs",
    "dedup_jaccard_prefix_filter",
    "dedup_minhash_pairs",
    "dedup_semantic_drift_serve",
    "dedup_simhash_pairs",
    "embedding_knn_probe",
    "embedding_pca_power",
    "events_markov_attribution",
    "flagship_top_movers",
    "graph_assortativity",
    "graph_bfs_hops",
    "graph_brand_modularity",
    "graph_clustering_coefficient",
    "graph_copurchase_pagerank",
    "graph_kcore_peel",
    "graph_rich_club",
    "ml_kmeans_summary",
    "orders_frequent_triples",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "sim_bruteforce_topk",
    "sim_ivf_binary_recall_audit",
    "sim_ivf_binary_topk",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "sim_sq8_relation_topk",
    "sim_topk_relation",
    "source_tick_batch",
    "source_tick_stream_serve",
    "stats_bootstrap_ci",
    "stats_spearman_corr",
    "text_ngram_novelty",
    "ts_dtw_pairs",
    "ts_lttb_downsample",
    "ts_resample_interpolate",
    "udf_grouped_map_zscore",
})
RUNS_HV = 5

# Round stamp for the durable samples copy (see SCALE.md audit-trail
# correction: bench_runs_local.json is last-writer-wins scratch; the
# round-stamped copy is the audit trail BASELINE.md points at).
ROUND = 14

# Per-run sample artifacts live under bench_runs/ (ADVICE r10: 29 one-line
# scratch files at the repo root cluttered the top level); only the
# consolidated BENCH_rNN.json written by the driver stays at the root.
RUNS_DIR = "bench_runs"

# Load guard (r9, VERDICT r8 item 1): the r8 driver-stamped bench was
# environment-contaminated — untouched queries drifted up to 5x between
# runs taken hours apart on an otherwise identical tree.  A fixed cheap
# calibration query runs first (3x, median = this run's reference) and
# again every CAL_EVERY queries; a check whose median departs >CAL_RATIO
# from the reference marks the surrounding segment's queries as
# "load_flagged" in the samples file, so SCALE.md's trend lines can
# exclude contaminated segments MECHANICALLY instead of by post-hoc
# spread arguments.
CALIBRATION = "scalar_string_fns"
CAL_EVERY = 50
CAL_RATIO = 1.3
# Ratio alone over-flags: the calibration query is ~0.17 s warm, where
# GC jitter alone moves the median ±0.15 s (the r9 anchor run's final
# check read 1.9x on a 0.16 s delta with nothing else running).  Real
# machine load (the r8 contamination was 3-5x on multi-second queries)
# moves it by whole multiples AND by absolute seconds, so a check flags
# only when BOTH the ratio and an absolute floor trip.
CAL_MIN_DELTA = 0.3


def _run_once(qs, name: str, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _calibrate(qs, spark, sf_dir: str, warm: int = 0) -> float:
    """Median of 3 runs; ``warm`` extra runs are taken FIRST and discarded
    (the initial reference must not absorb JVM/codegen cold-start — the
    r9 anchor run's first-median was 11x its steady state)."""
    for _ in range(warm):
        _run_once(qs, CALIBRATION, spark, sf_dir)
    samples = sorted(_run_once(qs, CALIBRATION, spark, sf_dir) for _ in range(3))
    return samples[1]


def _cal_flagged(median: float, ref: float) -> bool:
    return median > ref * CAL_RATIO and median - ref > CAL_MIN_DELTA


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # Coverage by construction: every oracle-bearing query is benched.
    listed = set(names)
    names += sorted(
        n for n, q in qs.items() if q.oracle is not None and n not in listed
    )
    # Isolated re-measure mode (not used by the driver, which passes no
    # argv): `python bench.py name...` scopes the run to those queries —
    # the mechanism for BASELINE.md's "re-measure outliers in isolation".
    if len(sys.argv) > 1:
        requested = [n for n in sys.argv[1:] if n in qs]
        missing = [n for n in sys.argv[1:] if n not in qs]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        names = requested

    # Warmup: JVM + codegen + parquet footer reads, not counted.
    qs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    cal_ref = _calibrate(qs, spark, sf_dir, warm=2)
    cal_checks = [{"at": 0, "median": cal_ref, "ratio": 1.0, "flagged": False}]

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for qi, name in enumerate(names):
        if qi and qi % CAL_EVERY == 0:
            cm = _calibrate(qs, spark, sf_dir)
            ratio = round(cm / cal_ref, 3) if cal_ref > 0 else None
            cal_checks.append(
                {
                    "at": qi,
                    "median": cm,
                    "ratio": ratio,
                    "flagged": _cal_flagged(cm, cal_ref),
                }
            )
        # Spark's ContextCleaner reclaims accumulated broadcasts/shuffle
        # files only after JVM GC notices the weak refs; across a 160+
        # query session that lag inflated mid-run queries ~2x (r7:
        # dedup_embedding_cosine 11.6 s in-bench vs 5.9 s isolated, back
        # to 6.3 s with this).  r12: the every-10 nudge left Arrow-stage
        # queries hostage to WHERE in the 10-window they run —
        # embedding_knn_probe sampled [11.4, 14.1, 10.0, 1.58, 6.0] when
        # 16 heavy ANN serves preceded it (the r11 "bimodality": a full
        # GC landing mid-samples), vs [1.9, 1.2, ...] in the clean
        # anchor.  The nudge sits HERE — after the calibration block,
        # immediately before the sample loop — so every query's samples
        # (including the first query's, and the CAL_EVERY-th queries',
        # whose calibration run would otherwise wedge between nudge and
        # samples) start debris-isolated (~0.1 s/query, uniform, dwarfed
        # by the 3-5 samples).
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        # Queries that localCheckpoint model/edge relations (IVF, PageRank,
        # MinHash signatures, triangles) leave persistent RDDs behind; 3
        # runs x N queries of leakage degrades LATER queries' timings (r4:
        # embedding_pq_codebook ran 1.1s cold but 7-11s after pagerank's
        # accumulated checkpoints). A real pipeline unpersists after use.
        # r13 measurement fix (disclosed in OPTIMIZATION_r13.md): the
        # unpersist now runs between SAMPLES, not just between queries —
        # the checkpoint-heavy queries' own debris piled up WITHIN their
        # 3/5-sample loop (graph_copurchase_pagerank sampled
        # [6.6, 3.7, 9.8, 22.9, 22.5] in a clean zero-flag full run:
        # monotone degradation from its own per-sample edge checkpoints,
        # ~100 MB each, freed only via ContextCleaner lag). Per-sample
        # isolation measures the query, not the harness debris, and
        # applies uniformly to every query.
        # r14: the sweep logic moved INTO the engine
        # (session.release_persisted_rdds — VERDICT r13 item 5: the engine,
        # not the harness, owns checkpoint hygiene); the harness calls the
        # same per-sample release it always did. Timing regions unchanged.
        def _unpersist_all() -> None:
            release_persisted_rdds(spark)

        samples = []
        for _ in range(RUNS_HV if name in HIGH_VARIANCE else RUNS):
            samples.append(_run_once(qs, name, spark, sf_dir))
            _unpersist_all()
        runs[name] = samples
        timings[name] = sorted(samples)[len(samples) // 2]  # median

    # Final calibration check closes the last segment.
    cm = _calibrate(qs, spark, sf_dir)
    ratio = round(cm / cal_ref, 3) if cal_ref > 0 else None
    cal_checks.append(
        {
            "at": len(names),
            "median": cm,
            "ratio": ratio,
            "flagged": _cal_flagged(cm, cal_ref),
        }
    )
    # A segment [check_k, check_{k+1}) is contaminated if EITHER endpoint
    # check is flagged — its queries go into load_flagged.
    load_flagged: list[str] = []
    for k in range(len(cal_checks) - 1):
        if cal_checks[k]["flagged"] or cal_checks[k + 1]["flagged"]:
            load_flagged.extend(names[cal_checks[k]["at"] : cal_checks[k + 1]["at"]])

    total = round(sum(timings.values()), 3)
    # Per-sample detail goes to a local file, NOT stdout: round 4's stdout
    # line with "all_runs" (3 samples x 92 queries) exceeded the driver's
    # capture and BENCH_r04 recorded "parsed": null. The stdout contract is
    # ONE compact line: metric / value / per-query medians / sf.
    # r8: also emit each query's max/min spread so SCALE.md's "noise, not
    # regression" calls are mechanical (threshold in BASELINE.md), and copy
    # the samples to a round-stamped file nothing overwrites.
    spread = {
        n: round(max(v) / min(v), 3) if min(v) > 0 else None
        for n, v in runs.items()
    }
    payload = {
        "runs_per_query": RUNS,
        "runs_high_variance": RUNS_HV,
        "all_runs": runs,
        "spread": spread,
        "calibration": {
            "query": CALIBRATION,
            "reference": cal_ref,
            "ratio_threshold": CAL_RATIO,
            "min_delta": CAL_MIN_DELTA,
            "checks": cal_checks,
        },
        "load_flagged": sorted(set(load_flagged)),
        "sf": sf,
    }
    try:
        os.makedirs(RUNS_DIR, exist_ok=True)
        with open(os.path.join(RUNS_DIR, "bench_runs_local.json"), "w") as f:
            json.dump(payload, f)
    except OSError:
        pass
    # Round-stamped copies never clobber (r7 lesson: the driver's post-
    # session run overwrote the builder's final samples, orphaning the
    # number SCALE.md cites) — each run of a round gets the next suffix.
    try:
        k = 0
        while True:
            name = f"bench_runs_r{ROUND}.json" if k == 0 else f"bench_runs_r{ROUND}_{k}.json"
            path = os.path.join(RUNS_DIR, name)
            if not os.path.exists(path):
                break
            k += 1
        with open(path, "w") as f:
            json.dump(payload, f)
    except OSError:
        pass
    # compact separators: the per-query map is ~160 entries now and the
    # driver's stdout capture keeps only a ~2000-char TAIL of the line
    # (BENCH_r01–r06 all lost "value" to the head truncation). Key ORDER is
    # therefore load-bearing: the big "queries" map goes FIRST so the
    # headline metric/value/unit/sf land in the surviving tail.
    print(
        json.dumps(
            {
                "queries": timings,
                "metric": "headline_queries_total_median",
                "value": total,
                "unit": "sec",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
