"""CLI: run oracle parity for all (or named) registered queries.

Usage: python -m real_time_scraping_and_predicting_time_series_data_spark.testing.run_parity [name ...]
Env:   PARITY_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

from ..plans.registry import all_queries
from ..session import get_spark
from .parity import duckdb_connection, run_query_parity


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    wanted = set(argv) or None
    qs = all_queries()
    if wanted:
        missing = wanted - set(qs)
        if missing:
            print(f"unknown queries: {sorted(missing)}; known: {sorted(qs)}")
            return 2
    spark = get_spark(app_name="parity")
    con = duckdb_connection(sf_dir)
    failures = 0
    for name, q in sorted(qs.items()):
        if wanted and name not in wanted:
            continue
        t0 = time.time()
        try:
            res = run_query_parity(spark, con, name, q.fn, q.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        if not res.ok:
            failures += 1
        print(f"{status} {name:40s} {dt:6.2f}s rows={res.spark_rows} {res.detail if not res.ok or 'dtype' in res.detail else ''}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
