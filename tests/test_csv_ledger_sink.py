"""Custom DataSource streaming WRITER (format("csvledger")): manifest-
committed CSV parts — end-to-end drain, manifest-only visibility, and
idempotent per-batch commit."""

from __future__ import annotations

import json
import os

from real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink import (
    _CsvLedgerStreamWriter,
    _PartMessage,
    read_ledger_rows,
    register_csv_ledger_sink,
)
from real_time_scraping_and_predicting_time_series_data_spark.sources.tick_source import (
    register_tick_source,
)


def test_stream_to_ledger_matches_batch(spark, tmp_path):
    register_tick_source(spark)
    register_csv_ledger_sink(spark)
    led = str(tmp_path / "ledger")
    q = (
        spark.readStream.format("tick")
        .option("max_polls", 100)
        .option("poll_batch", 30)
        .load()
        .writeStream.format("csvledger")
        .option("path", led)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = read_ledger_rows(led)
    batch = spark.read.format("tick").option("n_ticks", 100).load().collect()
    assert sorted(int(r[0]) for r in rows) == sorted(r.poll_id for r in batch)
    # manifest row counts agree with the parts
    with open(os.path.join(led, "_manifest.jsonl")) as f:
        entries = [json.loads(ln) for ln in f]
    assert sum(e["rows"] for e in entries) == len(rows)
    assert [e["batch_id"] for e in entries] == sorted(e["batch_id"] for e in entries)


def test_reader_ignores_unmanifested_parts(spark, tmp_path):
    led = str(tmp_path / "led2")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    # a committed part and an ORPHAN part (failed/speculated task debris)
    with open(os.path.join(led, "part-good.csv"), "w") as f:
        f.write("1,a\n2,b\n")
    with open(os.path.join(led, "part-orphan.csv"), "w") as f:
        f.write("9,z\n")
    w.commit([_PartMessage("part-good.csv", 2)], batchId=0)
    rows = read_ledger_rows(led)
    assert rows == [["1", "a"], ["2", "b"]]  # orphan invisible


def test_replayed_batch_commit_is_idempotent(spark, tmp_path):
    led = str(tmp_path / "led3")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    with open(os.path.join(led, "p0.csv"), "w") as f:
        f.write("1,a\n")
    with open(os.path.join(led, "p0r.csv"), "w") as f:
        f.write("1,a\n")
    w.commit([_PartMessage("p0.csv", 1)], batchId=0)
    # at-least-once replay of batch 0 re-commits under the same id: the
    # manifest line is REPLACED, never duplicated
    w.commit([_PartMessage("p0r.csv", 1)], batchId=0)
    rows = read_ledger_rows(led)
    assert rows == [["1", "a"]]
    with open(os.path.join(led, "_manifest.jsonl")) as f:
        entries = [json.loads(ln) for ln in f]
    assert len(entries) == 1 and entries[0]["parts"] == ["p0r.csv"]
