"""Round-14 optimization invariants: engine-side checkpoint hygiene
(VERDICT r13 item 5) — query plans may pin localCheckpoint RDDs, and the
engine (not the bench harness) provides the release; after the consuming
action + release, the session holds no persisted RDDs."""

from __future__ import annotations

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
    all_queries,
)
from real_time_scraping_and_predicting_time_series_data_spark.session import (
    release_persisted_rdds,
)

SF = "/root/testdata/sf0.001"

# checkpoint-heavy representatives: a graph-edge pin, a shingle-relation
# pin, and an ANN model pin
_PINNING_QUERIES = ("graph_hits", "dedup_jaccard_pairs", "sim_ivf_topk")


def _persisted(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_release_persisted_rdds_clears_query_pins(spark):
    qs = all_queries()
    for name in _PINNING_QUERIES:
        qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
    assert _persisted(spark) > 0, "expected the pinning queries to pin"
    release_persisted_rdds(spark)
    assert _persisted(spark) == 0


def test_release_persisted_rdds_idempotent_and_counts(spark):
    release_persisted_rdds(spark)
    assert release_persisted_rdds(spark) == 0
    qs = all_queries()
    qs["graph_hits"].fn(spark, SF).write.format("noop").mode("overwrite").save()
    assert release_persisted_rdds(spark) > 0
    assert _persisted(spark) == 0
