"""Hypothesis property tests (SURVEY.md §5.4): reference invariants hold on
arbitrary tick sequences, not just the curated fixtures.

Each example runs a Spark job, so examples are few and small — the point is
adversarial inputs (all-equal runs, negative prices, single elements),
which hypothesis finds and the fixture tests don't."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.asof import fifo_align
from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
    anchored_variation,
    change_dedup,
)

BASE = dt.datetime(2024, 1, 1)

# values from a tiny alphabet -> consecutive duplicates are common
values = st.lists(
    st.sampled_from([1.0, 2.0, 2.5, -3.0, 100.0]), min_size=1, max_size=12
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, vals):
    rows = [
        (i, BASE + dt.timedelta(seconds=5 * i), 1, float(v)) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")


def _python_reference(vals):
    """asyncio scraping.py:45-52,80 in plain python."""
    retained, last = [], None
    for i, v in enumerate(vals):
        if last is None or v != last:
            retained.append((i, v))
            last = v
    first = retained[0][1]
    return [(i, v, v / first - 1) for i, v in retained]


@given(vals=values)
@SLOW
def test_dedup_variation_matches_python_reference(spark, vals):
    got = sorted(
        (r.event_id, r.value, r.variation)
        for r in anchored_variation(change_dedup(_df(spark, vals))).collect()
    )
    want = sorted(_python_reference(vals))
    assert [(e, v) for e, v, _ in got] == [(e, v) for e, v, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert g == pytest.approx(w, abs=1e-12)


@given(vals=values)
@SLOW
def test_dedup_invariants(spark, vals):
    out = change_dedup(_df(spark, vals)).orderBy("ts", "event_id").collect()
    # no equal consecutive values survive
    for a, b in zip(out, out[1:]):
        assert a.value != b.value
    # first raw row always kept; retained is a subsequence of the input
    assert out[0].event_id == 0
    ids = [r.event_id for r in out]
    assert ids == sorted(ids)


@given(vals=values, offset=st.integers(min_value=0, max_value=4))
@SLOW
def test_fifo_align_injective_and_ordered(spark, vals, offset):
    df = _df(spark, vals)
    out = fifo_align(df, df, offset=offset).collect()
    matched = sorted(
        (r.event_id, r.r_event_id) for r in out if r.r_event_id is not None
    )
    rights = [b for _, b in matched]
    assert len(set(rights)) == len(rights)  # injective
    assert rights == sorted(rights)  # order-preserving
    # pairing distance is exactly `offset` positions
    for a, b in matched:
        assert b - a == offset


# -- nearest as-of vs pandas merge_asof ------------------------------------

_gap_lists = st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=8)


@given(left_offsets=_gap_lists, right_offsets=_gap_lists)
@SLOW
def test_asof_nearest_matches_pandas_merge_asof(spark, left_offsets, right_offsets):
    """asof_join_nearest must agree with pandas merge_asof(direction=
    'nearest') — an independent implementation of the semantics — whenever
    pandas' tie behavior is defined (pandas also prefers the backward match
    on exact ties). Offsets are seconds; tolerance 15s forces both matched
    and unmatched rows."""
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.asof import (
        asof_join_nearest,
    )

    left_rows = [
        (i, 1, BASE + dt.timedelta(seconds=s), float(i)) for i, s in enumerate(sorted(left_offsets))
    ]
    right_rows = [
        (100 + i, 1, BASE + dt.timedelta(seconds=s), 100.0 + i)
        for i, s in enumerate(sorted(right_offsets))
    ]
    schema = "event_id long, user_id long, ts timestamp, value double"
    got = {
        r["event_id"]: r["matched_value"]
        for r in asof_join_nearest(
            spark.createDataFrame(left_rows, schema),
            spark.createDataFrame(right_rows, schema),
            tolerance_seconds=15,
        ).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts", "value"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["event_id", "user_id", "ts", "value"]).sort_values("ts")
    merged = pd.merge_asof(
        lpd,
        rpd[["ts", "value"]].rename(columns={"value": "rv"}),
        on="ts",
        direction="nearest",
        tolerance=pd.Timedelta(seconds=15),
    )
    # pandas merge_asof collapses duplicate right timestamps to the LAST
    # row; our semantics pick the as-of survivor per direction. Only compare
    # where right timestamps are unique (the defined case).
    if rpd["ts"].is_unique:
        for _, row in merged.iterrows():
            want = None if pd.isna(row["rv"]) else row["rv"]
            assert got[row["event_id"]] == want, (row["event_id"], got[row["event_id"]], want)


# grids: duplicate-free order values with counts, including negative order
# values, single buckets, and count spikes
grid_rows = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=1, max_value=1000),
        st.integers(min_value=0, max_value=1000),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(rows=grid_rows, nbuckets=st.sampled_from([1, 2, 3, 64]))
@SLOW
def test_grid_cumsum_bit_identical_to_global_window(spark, rows, nbuckets):
    """The range-partitioned `grid_cumsum` must be BIT-IDENTICAL to the
    single-partition global running sum for ANY grid and ANY bucketing —
    the claim every converted query (KS, Mann-Whitney, Spearman, ABC,
    conformal, RFM...) rests on. Integer arithmetic end to end, so
    equality is exact, including multi-column sums and nbuckets=1
    (degenerate single bucket) and nbuckets > |grid|."""
    from pyspark.sql import Window

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        grid_cumsum,
    )

    g = spark.createDataFrame(rows, "v long, ca long, cb long")
    got = {
        (r.v, r.cum_ca, r.cum_cb)
        for r in grid_cumsum(g, ["ca", "cb"], nbuckets=nbuckets).collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r.v, r.cum_ca, r.cum_cb)
        for r in g.select(
            "v",
            F.sum("ca").over(w).cast("long").alias("cum_ca"),
            F.sum("cb").over(w).cast("long").alias("cum_cb"),
        ).collect()
    }
    assert got == want


@given(rows=grid_rows, split=st.integers(min_value=0, max_value=100))
@SLOW
def test_value_grid_merge_equals_whole(spark, rows, split):
    """Mergeability — the claim every streaming grid store rests on:
    splitting the rows into two batches, reducing each to its own value
    grid, and grouped-sum merging equals the one-batch grid, hence every
    statistic computed from it (KS here) is bit-identical."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        ks_from_value_grid,
    )

    g = spark.createDataFrame(rows, "v long, ca long, cb long")
    a = g.filter((F.col("v") % 7) <= (split % 7))
    b = g.filter((F.col("v") % 7) > (split % 7))
    merged = a.unionByName(b).groupBy("v").agg(
        F.sum("ca").cast("long").alias("ca"), F.sum("cb").cast("long").alias("cb")
    )
    # degenerate grids (one side empty) legitimately yield no KS row on
    # both sides — equality still must hold
    got = sorted(tuple(r) for r in ks_from_value_grid(merged).collect())
    want = sorted(tuple(r) for r in ks_from_value_grid(g).collect())
    assert got == want


# tiny-alphabet corpora: heavy shingle collisions, duplicate docs, empty-ish docs
tiny_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=3, max_size=8),
    min_size=2,
    max_size=8,
)


@given(docs=tiny_docs)
@SLOW
def test_prefix_filter_lossless_vs_bruteforce(spark, docs):
    """PPJoin losslessness (the prefix lemma) on adversarial tiny-alphabet
    corpora — every Jaccard >= 0.5 pair found by the brute-force
    inverted-index join must be found by the prefix-filtered join, and
    vice versa, including duplicate documents and all-shared-token
    corpora where every prefix collides."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_prefix_filter_pairs,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.n_common, r.jaccard)
        for r in jaccard_prefix_filter_pairs(df, tau=0.5, n=2).collect()
    }
    want = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.n_common, round(r.jaccard, 9))
        for r in jaccard_pairs(df, block=None, n=2, threshold=0.5).collect()
    }
    assert got == want


def test_drift_statistics_degenerate_grids(spark):
    """Degenerate merged grids (one side empty, all-ties, single value)
    must yield a well-defined result — no row where the statistic is
    undefined, NULL z where only the normal approximation is — never an
    ANSI divide-by-zero. These states are REACHABLE: the streaming drift
    monitor serves from the merged grid before both sources have data."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        jsd_from_value_grid,
        ks_from_value_grid,
        mann_whitney_from_value_grid,
        psi_from_value_grid,
    )

    def grid(rows):
        return spark.createDataFrame(rows, "v long, ca long, cb long")

    for rows in ([(1, 5, 0), (2, 3, 0)], [(1, 0, 5)], [(1, 0, 0)]):
        g = grid(rows)
        assert ks_from_value_grid(g).count() == 0
        assert mann_whitney_from_value_grid(g).count() == 0
        assert jsd_from_value_grid(g).count() <= 1  # both-empty folds to 0 rows via filter
        psi_from_value_grid(g).collect()  # defined via smoothing; must not raise

    # all values tie: U is defined, the z normal approximation is not
    r = mann_whitney_from_value_grid(grid([(7, 3, 4)])).collect()
    assert len(r) == 1
    assert r[0].u_stat == 3 * 4 / 2  # midrank U under complete ties
    assert r[0].z_score is None


type_grid_rows = st.lists(
    st.tuples(
        st.sampled_from(["click", "purchase"]),
        st.integers(min_value=-100, max_value=100),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),
)


@given(rows=type_grid_rows, split=st.integers(min_value=0, max_value=6))
@SLOW
def test_quantile_grid_merge_equals_whole(spark, rows, split):
    """Mergeability of the per-type quantile grid (the streaming
    QuantileStreamAccumulator claim): split + grouped-sum merge serves
    the exact whole-grid nearest-rank quantiles."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        quantiles_from_type_grid,
    )

    g = spark.createDataFrame(rows, "event_type string, v long, cnt long")
    a = g.filter((F.col("v") % 7) <= split)
    b = g.filter((F.col("v") % 7) > split)
    merged = a.unionByName(b).groupBy("event_type", "v").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    got = sorted(tuple(r) for r in quantiles_from_type_grid(merged).collect())
    want = sorted(tuple(r) for r in quantiles_from_type_grid(g).collect())
    assert got == want


# ---------------------------------------------------------------------------
# r9: large-star/small-star CC == min-label CC on arbitrary graphs, and both
# == a plain-python union-find reference
# ---------------------------------------------------------------------------

_edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)),
    min_size=0,
    max_size=20,
)


def _uf_reference(edges, n_nodes=15):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@SLOW
@given(edges=_edge_lists)
def test_star_cc_matches_union_find(spark, edges):
    """connected_components_star on ARBITRARY hypothesis-generated graphs
    (self-loops, duplicates, reversed edges, isolated nodes) must equal a
    plain-python union-find AND the min-label propagation."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    n_nodes = 15
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    if edges:
        e = spark.createDataFrame(edges, "src long, dst long")
    else:
        e = spark.createDataFrame([], "src long, dst long")
    want = _uf_reference(edges, n_nodes)
    got_star = {r.node: r.label for r in connected_components_star(e, nodes).collect()}
    assert got_star == want
    got_min = {r.node: r.label for r in connected_components(e, nodes).collect()}
    assert got_min == want


@SLOW
@given(edges=_edge_lists, n_cells=st.sampled_from([1, 2, 4]))
def test_cell_local_cc_matches_union_find(spark, edges, n_cells):
    """cell_local_components on ARBITRARY hypothesis graphs, partitioned
    into cells by node-id range so every edge stays cell-confined (the
    operator's contract), must equal the plain-python union-find — the
    r11 per-cell grouped-map CC is label-for-label the min-label fixpoint.
    Edges whose endpoints straddle a range boundary are dropped from BOTH
    sides (the contract excludes them), isolated members label as self."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        cell_local_components,
    )

    n_nodes = 15
    width = (n_nodes + n_cells - 1) // n_cells
    cell_of = lambda v: v // width  # noqa: E731
    kept = [(s, d) for s, d in edges if cell_of(s) == cell_of(d)]
    members = [(cell_of(v), v) for v in range(n_nodes)]
    m = spark.createDataFrame(members, "cell int, node long")
    if kept:
        e = spark.createDataFrame(
            [(cell_of(s), s, d) for s, d in kept], "cell int, src long, dst long"
        )
    else:
        e = spark.createDataFrame([], "cell int, src long, dst long")
    want = _uf_reference(kept, n_nodes)
    got = {r.node: r.label for r in cell_local_components(e, m).collect()}
    assert got == want
