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


def test_compact_ledger_fold_bit_identity_and_replay_guard(spark, tmp_path):
    """r8 (VERDICT r7 item 6): the ledger's compact() mirrors the grid
    stores' union fold — same row multiset before/after, bounded file
    count, replay-after-fold dropped, crash debris invisible."""
    from real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink import (
        compact_ledger,
        ledger_compacted_upto,
    )

    led = str(tmp_path / "led4")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    for b in range(5):
        for p in range(2):  # two "partitions" per batch
            name = f"b{b}p{p}.csv"
            with open(os.path.join(led, name), "w") as f:
                f.write(f"{b},{p}\n")
        w.commit([_PartMessage(f"b{b}p0.csv", 1), _PartMessage(f"b{b}p1.csv", 1)], batchId=b)
    before = sorted(map(tuple, read_ledger_rows(led)))
    assert len(before) == 10

    rep = compact_ledger(led)
    assert rep["folded_entries"] == 5 and rep["upto"] == 4 and rep["rows"] == 10
    # one consolidated part + the manifest
    assert rep["files_after"] == 2
    assert ledger_compacted_upto(led) == 4
    # fold bit-identity: exact same row multiset through the reader
    assert sorted(map(tuple, read_ledger_rows(led))) == before

    # at-least-once REPLAY of a folded batch: dropped, parts swept
    with open(os.path.join(led, "replay.csv"), "w") as f:
        f.write("3,0\n3,1\n")
    w.commit([_PartMessage("replay.csv", 2)], batchId=3)
    assert sorted(map(tuple, read_ledger_rows(led))) == before
    assert not os.path.exists(os.path.join(led, "replay.csv"))

    # NEW batches after the fold commit normally and a second fold
    # absorbs fold + new parts into one entry again
    with open(os.path.join(led, "b5.csv"), "w") as f:
        f.write("5,0\n")
    w.commit([_PartMessage("b5.csv", 1)], batchId=5)
    assert len(read_ledger_rows(led)) == 11
    rep2 = compact_ledger(led)
    assert rep2["upto"] == 5 and rep2["rows"] == 11 and rep2["files_after"] == 2
    assert len(read_ledger_rows(led)) == 11
    # idempotent no-op fold keeps everything
    rep3 = compact_ledger(led)
    assert rep3["upto"] == 5 and len(read_ledger_rows(led)) == 11


def test_compact_crash_between_fold_and_publish(spark, tmp_path, monkeypatch):
    """r9 (VERDICT r8 item 6): kill the compact BETWEEN writing the
    consolidated part and publishing the manifest — the orphan folded part
    must stay invisible (reader invariance) and a re-compact must succeed,
    the same staging-rename hazard the parquet stores pin."""
    import real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink as cls

    led = str(tmp_path / "led6")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    for b in range(3):
        name = f"b{b}.csv"
        with open(os.path.join(led, name), "w") as f:
            f.write(f"{b},x\n")
        w.commit([_PartMessage(name, 1)], batchId=b)
    before = sorted(map(tuple, read_ledger_rows(led)))

    real_write = cls._write_manifest

    def crash_write(path, entries):
        raise OSError("simulated crash before manifest publish")

    monkeypatch.setattr(cls, "_write_manifest", crash_write)
    try:
        cls.compact_ledger(led)
        raise AssertionError("expected the simulated crash")
    except OSError:
        pass
    monkeypatch.setattr(cls, "_write_manifest", real_write)

    # orphan consolidated part is on disk but NOT resolved by the reader
    orphans = [f for f in os.listdir(led) if f.startswith("compacted-")]
    assert orphans, "fold should have staged a consolidated part"
    assert sorted(map(tuple, read_ledger_rows(led))) == before
    # manifest still lists the original per-batch entries
    with open(os.path.join(led, "_manifest.jsonl")) as f:
        entries = [json.loads(ln) for ln in f]
    assert [e["batch_id"] for e in entries] == [0, 1, 2]

    # re-compact after the crash succeeds and preserves the row multiset
    rep = cls.compact_ledger(led)
    assert rep["upto"] == 2 and rep["rows"] == 3
    assert sorted(map(tuple, read_ledger_rows(led))) == before


def test_compact_merges_commit_landing_in_window(spark, tmp_path, monkeypatch):
    """r9 (ADVICE r8): a micro-batch commit that lands between compact's
    manifest snapshot and its locked rewrite must be carried forward, not
    silently dropped — compact re-merges entries above the folded
    high-water mark under the manifest lock."""
    import contextlib

    import real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink as cls

    led = str(tmp_path / "led7")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    for b in range(3):
        name = f"b{b}.csv"
        with open(os.path.join(led, name), "w") as f:
            f.write(f"{b},x\n")
        w.commit([_PartMessage(name, 1)], batchId=b)

    real_lock = cls._manifest_lock
    state = {"injected": False}

    @contextlib.contextmanager
    def racing_lock(path):
        # first acquisition comes from compact's rewrite: inject a real
        # commit of batch 3 FIRST (the stream-execution thread winning the
        # race for the lock), then let compact proceed.
        if not state["injected"]:
            state["injected"] = True
            name = "b3-late.csv"
            with open(os.path.join(led, name), "w") as f:
                f.write("3,late\n")
            w.commit([_PartMessage(name, 1)], batchId=3)
        with real_lock(path):
            yield

    monkeypatch.setattr(cls, "_manifest_lock", racing_lock)
    rep = cls.compact_ledger(led)
    monkeypatch.setattr(cls, "_manifest_lock", real_lock)

    assert rep["upto"] == 2  # fold covered only the snapshot batches
    rows = sorted(map(tuple, read_ledger_rows(led)))
    assert ("3", "late") in rows and len(rows) == 4  # late commit survives
    with open(os.path.join(led, "_manifest.jsonl")) as f:
        entries = [json.loads(ln) for ln in f]
    assert entries[0]["compacted_upto"] == 2
    assert [e["batch_id"] for e in entries[1:]] == [3]
    # second fold absorbs the late batch
    rep2 = cls.compact_ledger(led)
    assert rep2["upto"] == 3 and rep2["rows"] == 4
    assert sorted(map(tuple, read_ledger_rows(led))) == rows


def test_compact_rows_counts_csv_records_not_lines(spark, tmp_path):
    """r9 (ADVICE r8): compact's reported `rows` uses csv.reader record
    semantics — a quoted field with an embedded newline is ONE row, in
    agreement with read_ledger_rows."""
    import csv as _csv

    from real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink import (
        compact_ledger,
    )

    led = str(tmp_path / "led8")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    with open(os.path.join(led, "p0.csv"), "w", newline="") as f:
        cw = _csv.writer(f)
        cw.writerow(["1", "line1\nline2"])  # 1 record, 2 physical lines
        cw.writerow(["2", "plain"])
    w.commit([_PartMessage("p0.csv", 2)], batchId=0)
    assert read_ledger_rows(led) == [["1", "line1\nline2"], ["2", "plain"]]
    rep = compact_ledger(led)
    assert rep["rows"] == 2  # records, not '\n' count (which would be 3)
    assert read_ledger_rows(led) == [["1", "line1\nline2"], ["2", "plain"]]


def test_compact_ledger_streaming_end_to_end(spark, tmp_path):
    """Fold under a real streaming drain + restart: rows served by the
    manifest reader are identical across (stream, compact, resume-stream,
    compact) — the checkpoint-restart x compaction matrix of
    test_store_compaction.py applied to the CSV ledger."""
    from real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink import (
        compact_ledger,
    )

    register_tick_source(spark)
    register_csv_ledger_sink(spark)
    led = str(tmp_path / "led5")
    ckpt = str(tmp_path / "ckpt5")

    def drain(max_polls):
        q = (
            spark.readStream.format("tick")
            .option("max_polls", max_polls)
            .option("poll_batch", 20)
            .load()
            .writeStream.format("csvledger")
            .option("path", led)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    def batch_ids(n):
        return sorted(
            r.poll_id
            for r in spark.read.format("tick").option("n_ticks", n).load().collect()
        )

    drain(60)
    first = sorted(int(r[0]) for r in read_ledger_rows(led))
    assert first == batch_ids(60)
    compact_ledger(led)
    assert sorted(int(r[0]) for r in read_ledger_rows(led)) == first
    # resume from checkpoint past the fold; offsets continue, no re-emit
    drain(100)
    assert sorted(int(r[0]) for r in read_ledger_rows(led)) == batch_ids(100)
    compact_ledger(led)
    assert sorted(int(r[0]) for r in read_ledger_rows(led)) == batch_ids(100)


def test_compact_sweeps_replay_parts_landing_in_window(spark, tmp_path, monkeypatch):
    """r10 (ADVICE r9): a REPLAY of an already-folded batch id that commits
    between compact's manifest snapshot and its locked rewrite is dropped
    from the manifest (its rows live on via the folded originals) — and its
    freshly written part files must be swept too, not orphaned forever."""
    import contextlib

    import real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink as cls

    led = str(tmp_path / "led9")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    for b in range(3):
        name = f"b{b}.csv"
        with open(os.path.join(led, name), "w") as f:
            f.write(f"{b},x\n")
        w.commit([_PartMessage(name, 1)], batchId=b)

    real_lock = cls._manifest_lock
    state = {"injected": False}

    @contextlib.contextmanager
    def racing_lock(path):
        # first acquisition is compact's rewrite: inject a replay of batch 1
        # (same rows, NEW uuid-style part name) before compact takes the
        # lock — the replay's manifest line replaces the snapshot's.
        if not state["injected"]:
            state["injected"] = True
            name = "b1-replay.csv"
            with open(os.path.join(led, name), "w") as f:
                f.write("1,x\n")
            w.commit([_PartMessage(name, 1)], batchId=1)
        with real_lock(path):
            yield

    monkeypatch.setattr(cls, "_manifest_lock", racing_lock)
    rep = cls.compact_ledger(led)
    monkeypatch.setattr(cls, "_manifest_lock", real_lock)

    assert rep["upto"] == 2
    # served rows are exactly the three originals — the replay added nothing
    assert sorted(map(tuple, read_ledger_rows(led))) == [
        ("0", "x"), ("1", "x"), ("2", "x"),
    ]
    with open(os.path.join(led, "_manifest.jsonl")) as f:
        entries = [json.loads(ln) for ln in f]
    assert len(entries) == 1 and entries[0]["compacted_upto"] == 2
    # the replay's part file was swept with the folded originals — no
    # permanent invisible orphans accumulate under replay x compact races
    leftover = [f for f in os.listdir(led) if f.endswith(".csv")]
    assert leftover == entries[0]["parts"]
    assert "b1-replay.csv" not in leftover


def test_compact_streams_parts_without_slurping(spark, tmp_path, monkeypatch):
    """r10 (ADVICE r9): compact copies part files record-by-record — it
    never reads a whole part into memory (pf.read is not called)."""
    from real_time_scraping_and_predicting_time_series_data_spark.sources.csv_ledger_sink import (
        compact_ledger,
        read_ledger_rows as _read,
    )

    led = str(tmp_path / "led10")
    os.makedirs(led)
    w = _CsvLedgerStreamWriter({"path": led})
    import csv as _csv

    with open(os.path.join(led, "big.csv"), "w", newline="") as f:
        cw = _csv.writer(f)
        for i in range(5000):
            cw.writerow([str(i), "v\nq" if i % 7 == 0 else "v"])
    w.commit([_PartMessage("big.csv", 5000)], batchId=0)
    before = _read(led)

    import builtins

    real_open = builtins.open
    slurped = []

    class _GuardedFile:
        def __init__(self, fh):
            self._fh = fh

        def read(self, *a, **k):  # whole-file slurp guard
            if not a or a[0] in (None, -1):
                slurped.append(self._fh.name)
            return self._fh.read(*a, **k)

        def __getattr__(self, n):
            return getattr(self._fh, n)

        def __iter__(self):
            return iter(self._fh)

        def __enter__(self):
            self._fh.__enter__()
            return self

        def __exit__(self, *a):
            return self._fh.__exit__(*a)

    def guarded_open(file, *a, **k):
        fh = real_open(file, *a, **k)
        if str(file).endswith(".csv") and (not a or "r" in str(a[0])):
            return _GuardedFile(fh)
        return fh

    monkeypatch.setattr(builtins, "open", guarded_open)
    rep = compact_ledger(led)
    monkeypatch.setattr(builtins, "open", real_open)

    assert rep["rows"] == 5000 and not slurped
    assert _read(led) == before
