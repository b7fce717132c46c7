"""Property tests for the cross-engine M61 universal-hash layer
(functions/hashing.py) — the arithmetic every MinHash signature, CMS
counter, and Bloom bit depends on.

Three layers: (1) the overflow-safe decomposition equals true bigint
modular arithmetic; (2) the Spark Column form equals the Python form;
(3) the SQL-text form evaluates identically in DuckDB — so a single hash
definition provably produces the same 60-bit values on both engines.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_scraping_and_predicting_time_series_data_spark.functions.hashing import (
    M61,
    md5_60,
    md5_60_sql,
    mulmod61,
    mulmod61_sql,
    perm61,
    perm61_sql,
)

_LO30 = (1 << 30) - 1
_LO31 = (1 << 31) - 1


def _mulmod61_py(a: int, h: int) -> int:
    z = a * (h >> 31)
    zm = ((z & _LO30) << 31) + (z >> 30)
    return (zm % M61 + a * (h & _LO31)) % M61


@given(
    a=st.integers(min_value=1, max_value=(1 << 30) - 1),
    h=st.integers(min_value=0, max_value=(1 << 61) - 1),
)
@settings(max_examples=2000, deadline=None)
def test_mulmod61_decomposition_exact(a: int, h: int):
    """The BIGINT-safe decomposition equals true (a*h) mod M61, and every
    intermediate fits in a signed 64-bit integer."""
    z = a * (h >> 31)
    assert z < (1 << 60)
    zm = ((z & _LO30) << 31) + (z >> 30)
    assert zm < (1 << 62)
    assert zm % M61 + a * (h & _LO31) < (1 << 63)
    assert _mulmod61_py(a, h) == (a * h) % M61


def test_mulmod61_rejects_wide_a():
    with pytest.raises(ValueError):
        mulmod61(1 << 30, None)
    with pytest.raises(ValueError):
        mulmod61_sql(0, "h")


def test_spark_and_duckdb_agree_on_hash_chain(spark):
    """End-to-end: md5_60 + perm61 produce identical values for identical
    strings on both engines (sampled over real corpus tokens)."""
    from pyspark.sql import functions as F

    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    ).distinct()
    a, b = 918273645, 123456789
    got = {
        r.t: (r.h, r.p)
        for r in toks.select(
            "t", md5_60("t").alias("h"), perm61(a, b, md5_60("t")).alias("p")
        ).collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE toks (t VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?)", [(t,) for t in got])
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT t, {md5_60_sql('t')} AS h, "
            f"{perm61_sql(a, b, md5_60_sql('t'))} AS p FROM toks"
        ).fetchall()
    }
    assert len(got) > 20  # word-soup corpus has a small vocabulary
    assert got == want
