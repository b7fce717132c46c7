"""Oracle-differential parity harness (SURVEY.md §5.1).

Mirrors the driver's correctness gate locally: run each registered query on
Spark AND its SQL twin on DuckDB over the same parquet, compare row count +
column names/dtypes + order-insensitive values. Stricter than the driver
(exact value equality after canonicalization) so that passing here implies
passing any reasonable hash-based comparison.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from ..catalog import TABLES

__all__ = ["ParityResult", "duckdb_connection", "compare_frames", "run_query_parity"]


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # Preserve the sign of zero: the driver's value hash distinguishes
        # -0.0 from +0.0 (it bit us in ts_rolling_corr r3), so the local
        # harness must be at least as strict. round() keeps the sign.
        return repr(round(v, 12))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return repr(v)


def _canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return cols, out


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> ParityResult:
    if len(sdf) != len(odf):
        return ParityResult(name, False, f"row count: spark={len(sdf)} oracle={len(odf)}", len(sdf), len(odf))
    scols, srows = _canon_frame(sdf)
    ocols, orows = _canon_frame(odf)
    if scols != ocols:
        return ParityResult(name, False, f"columns: spark={scols} oracle={ocols}", len(sdf), len(odf))
    sdt = {c: str(sdf[c].dtype) for c in scols}
    odt = {c: str(odf[c].dtype) for c in ocols}
    dtype_diff = {c: (sdt[c], odt[c]) for c in scols if sdt[c] != odt[c]}
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            return ParityResult(
                name,
                False,
                f"value mismatch at sorted row {i}:\n  spark : {a}\n  oracle: {b}\n  dtypes: {dtype_diff}",
                len(sdf),
                len(odf),
            )
    detail = "ok" if not dtype_diff else f"ok (dtype diff: {dtype_diff})"
    return ParityResult(name, True, detail, len(sdf), len(odf))


def run_query_parity(spark, con, name: str, fn, oracle: str | None, sf_dir: str) -> ParityResult:
    df = fn(spark, sf_dir)
    if oracle is not None:
        # Strict driver-compatibility gate (VERDICT r4 item 6): the local
        # canonicalizer serializes lists (_canon_value) and so PASSED the
        # query whose array column crashed the driver's pandas-based hash
        # (collect_sorted_lists, CORRECTNESS_r04). Refuse complex-typed
        # output columns on oracle-bearing queries outright — CSV-serialize
        # them in the operator instead (the ts_sliding_features_arrays
        # pattern).
        from pyspark.sql import types as T

        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            return ParityResult(
                name,
                False,
                f"complex-typed output columns {bad} would crash the driver "
                "canonicalizer; serialize to scalars (array_join) instead",
            )
    sdf = df.toPandas()
    if oracle is None:
        ok = len(sdf) >= 0
        return ParityResult(name, ok, f"rows-only ({len(sdf)} rows)", len(sdf), -1)
    odf = con.sql(oracle).df()
    return compare_frames(name, sdf, odf)
