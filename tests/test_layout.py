"""Z-order layout: 2-D box predicates touch far fewer files than a 1-D sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.sources.layout import (
    rank_scale,
    write_zordered,
    zvalue,
)


def _files_touched(path, lo_u, hi_u, lo_v, hi_v):
    """Files whose (user_id, value) min/max rectangle intersects the box —
    exactly the skipping decision a parquet reader makes from footers."""
    touched = 0
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        umin = vmin = float("inf")
        umax = vmax = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                name = c.path_in_schema
                st = c.statistics
                if st is None:
                    continue
                if name == "user_id":
                    umin, umax = min(umin, st.min), max(umax, st.max)
                elif name == "value":
                    vmin, vmax = min(vmin, st.min), max(vmax, st.max)
        if umin <= hi_u and umax >= lo_u and vmin <= hi_v and vmax >= lo_v:
            touched += 1
    return touched


def test_zorder_prunes_2d_boxes(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    write_zordered(ev, z_path, "user_id", "value", bits=12, n_files=32)
    # baseline: same file count, sorted on user_id only
    (
        ev.repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(lin_path)
    )
    # layout is lossless
    assert spark.read.parquet(z_path).count() == ev.count()

    stats = ev.agg(
        F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
        F.min("value").alias("vlo"), F.max("value").alias("vhi"),
    ).collect()[0]
    du = (stats.uhi - stats.ulo) / 4
    dv = (stats.vhi - stats.vlo) / 4
    z_total = lin_total = 0
    for qu in range(4):
        for qv in range(4):
            lo_u, hi_u = stats.ulo + qu * du, stats.ulo + (qu + 0.9) * du
            lo_v, hi_v = stats.vlo + qv * dv, stats.vlo + (qv + 0.9) * dv
            z_total += _files_touched(z_path, lo_u, hi_u, lo_v, hi_v)
            lin_total += _files_touched(lin_path, lo_u, hi_u, lo_v, hi_v)
    # the user_id-sorted layout prunes on user_id but reads EVERY matching
    # file's full value range; z-order bounds both dims per file
    assert z_total < lin_total, (z_total, lin_total)
    assert z_total <= 0.75 * lin_total, (z_total, lin_total)


def test_zvalue_interleave_exact(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(zvalue(F.col("a"), F.col("b"), bits=3).alias("z")).collect()[0].z
    # a bits at even positions (1,0,1 -> 0b010001), b at odd (0,1,1 -> 0b001010)
    assert got == 0b011011


def test_rank_scale_bounds(spark):
    df = spark.createDataFrame([(i,) for i in range(1024)], "x long")
    for method in ("minmax", "quantile"):
        vals = [
            r.s
            for r in df.select(
                rank_scale(df, "x", bits=8, method=method).alias("s")
            ).collect()
        ]
        assert min(vals) == 0 and max(vals) >= 254, method
    # equi-depth: every code carries roughly equal mass on uniform input
    from collections import Counter
    counts = Counter(vals)
    assert max(counts.values()) <= 3 * (1024 // 256)


def test_compaction_merges_small_files_losslessly(spark, tmp_path):
    """64 tiny files -> ~target-size files; row set identical; coalesce
    plans NO exchange while shuffle+sort restores per-file min/max stats."""
    from real_time_scraping_and_predicting_time_series_data_spark.sources.compaction import (
        compact,
        file_census,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    src = str(tmp_path / "small")
    ev.repartition(64).write.parquet(src)
    census = file_census(spark, src)
    assert census["n_files"] == 64
    target = max(1, census["total_bytes"] // 4)  # aim for ~4 output files

    # shuffle-free merge
    dst = str(tmp_path / "compact")
    rep = compact(spark, src, dst, target_bytes=target, mode="coalesce")
    # writer skips empty partitions, so after <= n_target; the point is the
    # 64-file census collapsed to ~target-count files
    assert rep["after"]["n_files"] <= rep["n_target"] <= 6
    assert rep["after"]["n_files"] >= 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # re-clustering compaction: sorted output files must carry
    # non-overlapping user_id ranges (footer stats prune again)
    dst2 = str(tmp_path / "clustered")
    compact(spark, src, dst2, target_bytes=target, mode="shuffle", sort_by=("user_id",))
    spans = []
    for f in glob.glob(dst2 + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo, hi = float("inf"), float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                if c.path_in_schema == "user_id" and c.statistics is not None:
                    lo = min(lo, c.statistics.min)
                    hi = max(hi, c.statistics.max)
        spans.append((lo, hi))
    spans.sort()
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # ranges disjoint up to the boundary key
    c = spark.read.parquet(dst2)
    assert a.count() == c.count()

    # the cheap path really is shuffle-free: no Exchange in the coalesce plan
    plan = (
        spark.read.parquet(src)
        .coalesce(4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
