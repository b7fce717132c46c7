"""Custom Python DataSource WRITER: the reference's CSV ledger export as a
first-class Spark sink.

The reference persists its three tables as CSV files at shutdown
(`asyncio scraping.py:64-71`, `lvmh_forecaster2.py:187-211`) — a
non-transactional driver-side dump.  `sources/sinks.py::write_csv` covers
the batch form; this module adds the STREAMING form through the Python
DataSource writer API (``df.writeStream.format("csvledger")``), with the
transactional contract the reference lacks:

- executors write one CSV part per partition per micro-batch under a
  unique ``(partitionId, taskAttemptId, uuid)`` name;
- ``commit(messages, batchId)`` runs ONCE per successful batch on the
  driver and appends a manifest line naming exactly the committed parts —
  readers who resolve files through the manifest never see output from
  failed/speculated tasks (``abort`` leaves only unmanifested debris);
- a REPLAYED batch id overwrites its own manifest line idempotently, the
  same at-least-once contract as the engine's grid stores.

Same deployment assumption as the grid stores: paths are driver+executor
visible (local/NFS); on object stores the staging-rename becomes the
usual commit-protocol swap.
"""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

__all__ = ["CsvLedgerDataSource", "register_csv_ledger_sink", "read_ledger_rows"]


class _PartMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class _CsvLedgerStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("csvledger requires option('path', ...)")
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _PartMessage:
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = f"part-p{ctx.partitionId()}-t{ctx.taskAttemptId()}-{uuid.uuid4().hex[:8]}.csv"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w", newline="") as f:
            w = csv.writer(f)
            for row in iterator:
                w.writerow(list(row))
                n += 1
        return _PartMessage(name, n)

    def commit(self, messages, batchId: int) -> None:
        # one manifest line per committed batch; a replayed batchId
        # replaces its own line (idempotent at-least-once)
        manifest = os.path.join(self.path, "_manifest.jsonl")
        lines = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                lines = [json.loads(ln) for ln in f if ln.strip()]
        lines = [e for e in lines if e["batch_id"] != batchId]
        lines.append(
            {
                "batch_id": batchId,
                "parts": [m.filename for m in messages if m is not None],
                "rows": sum(m.n_rows for m in messages if m is not None),
            }
        )
        staging = manifest + ".staging"
        with open(staging, "w") as f:
            for e in sorted(lines, key=lambda e: e["batch_id"]):
                f.write(json.dumps(e) + "\n")
        os.replace(staging, manifest)

    def abort(self, messages, batchId: int) -> None:
        # unmanifested parts are invisible to readers; best-effort sweep
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class CsvLedgerDataSource(DataSource):
    """``format("csvledger")`` — manifest-committed streaming CSV sink."""

    @classmethod
    def name(cls):
        return "csvledger"

    def streamWriter(self, schema, overwrite: bool):
        return _CsvLedgerStreamWriter(self.options)


def register_csv_ledger_sink(spark) -> None:
    spark.dataSource.register(CsvLedgerDataSource)


def read_ledger_rows(path: str) -> list[list[str]]:
    """Rows of every MANIFESTED part (reader-side contract: resolve files
    through the manifest, never by listing)."""
    manifest = os.path.join(path, "_manifest.jsonl")
    out: list[list[str]] = []
    if not os.path.exists(manifest):
        return out
    with open(manifest) as f:
        entries = [json.loads(ln) for ln in f if ln.strip()]
    for e in entries:
        for part in e["parts"]:
            with open(os.path.join(path, part), newline="") as pf:
                out.extend(list(csv.reader(pf)))
    return out
