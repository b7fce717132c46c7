"""Registry contract tests: every query runs and matches its oracle shape."""

from __future__ import annotations

import pytest

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries
from real_time_scraping_and_predicting_time_series_data_spark.testing.parity import (
    duckdb_connection,
    run_query_parity,
)

from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def test_registry_nonempty():
    assert len(QUERIES) >= 40


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(E.oracle_sql()) <= set(E.queries())


@pytest.fixture(scope="module")
def oracle_con():
    return duckdb_connection(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity_smoke(spark, oracle_con, name):
    """Every registered query matches its DuckDB twin at sf0.001 (the driver
    runs the same comparison at sf0.01)."""
    q = QUERIES[name]
    res = run_query_parity(spark, oracle_con, name, q.fn, q.oracle, SF_SMOKE)
    assert res.ok, f"{name}: {res.detail}"


def test_front_load_names_all_resolve():
    """Every registry front-load name must name a REGISTERED query:
    unknown names are skipped 'harmlessly' at serve time, which means a
    typo would silently drop a query from the driver's correctness
    window — exactly the evidence gap the front-load exists to close."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        _FRONT,
        all_queries,
    )

    qs = all_queries()
    missing = [n for n in _FRONT if n not in qs]
    assert missing == []


def test_bench_covers_every_oracle_bearing_query():
    """bench.py's coverage-by-construction contract: the planned bench
    list is HEADLINE plus every oracle-bearing registry query — so a new
    oracle-checked operator can never silently skip the benchmark."""
    import bench

    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    qs = all_queries()
    names = [n for n in bench.HEADLINE if n in qs]
    listed = set(names)
    names += sorted(
        n for n, q in qs.items() if q.oracle is not None and n not in listed
    )
    oracle_bearing = {n for n, q in qs.items() if q.oracle is not None}
    assert oracle_bearing <= set(names)
    assert len(names) == len(set(names))
