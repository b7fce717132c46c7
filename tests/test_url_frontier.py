"""Streaming URL-frontier store (streaming/url_frontier.py): first-seen-wins
canonical-URL admission, at-least-once replay idempotence, compaction, and
ordered-arrival bit-parity of serve_frontier() with the batch
corpus_crawl_frontier scheduling."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from real_time_scraping_and_predicting_time_series_data_spark.streaming.url_frontier import (
    UrlFrontierStore,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
    ]
)

# batch 2 re-discovers batch-1 pages as messy variants (tracking params,
# case, www, default port) plus one genuinely new page.
BATCH_1 = [
    (1, "https://a.example.com/x"),
    (2, "https://a.example.com/y"),
    (3, "https://b.metro.co.uk/z"),
]
BATCH_2 = [
    (10, "HTTPS://A.Example.COM/x?utm_source=feed"),   # dup of 1
    (11, "https://www.a.example.com/y/"),               # dup of 2
    (12, "https://a.example.com/new"),                  # new
]
EXPECTED_URLS = {
    (1, "https://a.example.com/x"),
    (2, "https://a.example.com/y"),
    (3, "https://b.metro.co.uk/z"),
    (12, "https://a.example.com/new"),
}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _accepted(store):
    return {(r["doc_id"], r["canonical_url"]) for r in store.accepted().collect()}


def test_first_seen_canonical_across_batches(spark, tmp_path):
    store = UrlFrontierStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    store.ingest_batch(_df(spark, BATCH_2), 1)
    assert _accepted(store) == EXPECTED_URLS


def test_psl_registrable_domain_on_accepted_rows(spark, tmp_path):
    store = UrlFrontierStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    doms = {r["canonical_url"]: r["reg_domain"] for r in store.accepted().collect()}
    assert doms["https://a.example.com/x"] == "example.com"
    # multi-label public suffix: registrable domain is suffix + one label,
    # NOT the last-two-labels heuristic's "co.uk"
    assert doms["https://b.metro.co.uk/z"] == "metro.co.uk"


def test_replayed_batch_is_idempotent_and_not_self_suppressing(spark, tmp_path):
    store = UrlFrontierStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    store.ingest_batch(_df(spark, BATCH_2), 1)
    store.ingest_batch(_df(spark, BATCH_2), 1)  # at-least-once replay
    assert _accepted(store) == EXPECTED_URLS


def test_compaction_preserves_accepted_and_drops_folded_replay(spark, tmp_path):
    store = UrlFrontierStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    store.ingest_batch(_df(spark, BATCH_2), 1)
    info = store.compact()
    assert info["folded_batches"] == 2
    assert _accepted(store) == EXPECTED_URLS
    store.ingest_batch(_df(spark, BATCH_1), 0)  # replay of a folded batch
    assert _accepted(store) == EXPECTED_URLS


def test_streaming_attach_admits_exactly_once(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    for i, rows in enumerate((BATCH_1, BATCH_2)):
        with open(os.path.join(drop, f"b{i}.json"), "w") as f:
            for doc_id, url in rows:
                f.write(json.dumps({"doc_id": doc_id, "url": url}) + "\n")
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(drop, f"b{i}.json"), (t, t))

    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    store = UrlFrontierStore(spark, str(tmp_path / "store"))
    q = store.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _accepted(store) == EXPECTED_URLS


def test_serve_frontier_matches_batch_schedule_under_ordered_arrival(spark, tmp_path):
    """Ordered-arrival contract: batches split on ascending doc_id make
    first-seen == global min-doc_id survivor, so the served schedule equals
    the one-pass corpus_crawl_frontier rows bit-for-bit."""
    from pyspark.sql import functions as F

    from real_time_scraping_and_predicting_time_series_data_spark.catalog import (
        load_table,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        _synth_url_spark,
    )
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    n = raw.count()
    store = UrlFrontierStore(spark, str(tmp_path))
    for bid in range(3):
        lo, hi = bid * n // 3, (bid + 1) * n // 3
        store.ingest_batch(
            raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    served = {tuple(r) for r in store.serve_frontier(docs).collect()}
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    batch = {
        tuple(r) for r in all_queries()["corpus_crawl_frontier"].fn(spark, SF_CORRECT).collect()
    }
    assert served == batch
