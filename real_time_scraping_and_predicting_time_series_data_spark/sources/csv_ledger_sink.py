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
  same at-least-once contract as the engine's grid stores;
- ``compact(path)`` (r8) folds every manifested part into ONE consolidated
  CSV part with a single ``compacted_upto=<max batch id>`` manifest entry
  — the same bounded-directory-growth story as the grid stores'
  `streaming/store_compaction.py` (one part per partition per micro-batch
  is ~43k files/day at a 2-second trigger; listing cost eventually
  dominates).  The fold preserves the exact row multiset (pure
  concatenation in manifest order), the manifest rewrite is a staging
  ``os.replace`` (crash before the part sweep leaves orphan folded parts
  that are unmanifested, hence invisible), and a replayed batch id at or
  below ``compacted_upto`` is DROPPED at commit — its rows are inside the
  fold already, the same `is_compacted` ingest guard as the grid stores.

Same deployment assumption as the grid stores: paths are driver+executor
visible (local/NFS); on object stores the staging-rename becomes the
usual commit-protocol swap.
"""

from __future__ import annotations

import contextlib
import csv
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

__all__ = [
    "CsvLedgerDataSource",
    "register_csv_ledger_sink",
    "read_ledger_rows",
    "ledger_compacted_upto",
    "compact_ledger",
]


@contextlib.contextmanager
def _manifest_lock(path: str):
    """Exclusive advisory lock serializing manifest read-modify-write.

    ``commit`` runs on the stream-execution thread while ``compact_ledger``
    is a driver-side maintenance call — without serialization a commit
    landing between compact's manifest read and its rewrite would be
    silently dropped from the manifest (rows permanently invisible, never
    replayed since the checkpoint already advanced).  ``fcntl.flock`` works
    across threads AND processes on the local/NFS paths this sink targets;
    on platforms without fcntl (Windows) we degrade to no lock, matching
    the sink's documented single-writer deployment there."""
    os.makedirs(path, exist_ok=True)
    try:
        import fcntl  # noqa: PLC0415
    except ImportError:  # pragma: no cover - non-POSIX fallback
        yield
        return
    with open(os.path.join(path, "_manifest.lock"), "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def _ledger_files(path: str) -> list[str]:
    """Directory listing minus the advisory lock (not ledger data)."""
    if not os.path.isdir(path):
        return []
    return [f for f in os.listdir(path) if f != "_manifest.lock"]


def _read_manifest(path: str) -> list[dict]:
    manifest = os.path.join(path, "_manifest.jsonl")
    if not os.path.exists(manifest):
        return []
    with open(manifest) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _write_manifest(path: str, entries: list[dict]) -> None:
    manifest = os.path.join(path, "_manifest.jsonl")
    staging = manifest + ".staging"
    with open(staging, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    os.replace(staging, manifest)


def ledger_compacted_upto(path: str) -> int:
    """Highest batch id folded into a compacted manifest entry; -1 if the
    ledger was never compacted."""
    upto = -1
    for e in _read_manifest(path):
        if "compacted_upto" in e:
            upto = max(upto, e["compacted_upto"])
    return upto


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
        # replaces its own line (idempotent at-least-once).  A batchId at
        # or below compacted_upto was already FOLDED — its rows live in
        # the consolidated part, so the replay is dropped and its freshly
        # written parts removed (same is_compacted guard as the grid
        # stores' ingest path).  The whole read-modify-write holds the
        # manifest lock so a concurrent compact_ledger can neither drop
        # this commit nor race the replay-drop check.
        with _manifest_lock(self.path):
            lines = _read_manifest(self.path)
            if batchId <= max(
                (e["compacted_upto"] for e in lines if "compacted_upto" in e), default=-1
            ):
                for m in messages:
                    if m is not None:
                        try:
                            os.remove(os.path.join(self.path, m.filename))
                        except OSError:
                            pass
                return
            lines = [e for e in lines if e.get("batch_id") != batchId]
            lines.append(
                {
                    "batch_id": batchId,
                    "parts": [m.filename for m in messages if m is not None],
                    "rows": sum(m.n_rows for m in messages if m is not None),
                }
            )
            _write_manifest(
                self.path,
                sorted(lines, key=lambda e: e.get("batch_id", e.get("compacted_upto"))),
            )

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
    through the manifest, never by listing).  Compacted entries are just
    entries whose parts happen to be consolidated — same loop."""
    out: list[list[str]] = []
    for e in _read_manifest(path):
        for part in e["parts"]:
            with open(os.path.join(path, part), newline="") as pf:
                out.extend(list(csv.reader(pf)))
    return out


def compact_ledger(path: str) -> dict:
    """Fold every manifested part into ONE consolidated CSV part under a
    single ``compacted_upto=<max batch id>`` manifest entry, then sweep
    the folded parts — the CSV-ledger twin of
    ``streaming/store_compaction.py``'s union fold.

    The fold preserves the exact row MULTISET (concatenation in manifest
    order: prior fold first, then batches ascending), so
    ``read_ledger_rows`` before and after agree up to row order within the
    file — the same bit-identity contract the grid stores' folds carry.

    Crash-window safety, in write order: (1) consolidated part written under a
    fresh uuid name — unmanifested, invisible; (2) manifest atomically
    replaced (``os.replace``) with the single compacted entry — the fold
    becomes visible and the old parts become unmanifested in the same
    instant; (3) old parts removed — pure debris sweep, a crash before it
    leaves orphans no reader resolves.  Replays of folded batch ids are
    dropped at ``commit`` via the ``compacted_upto`` guard.

    Concurrency: the fold itself runs lock-free (it only reads a snapshot
    and writes an invisible uuid-named part), but the manifest rewrite
    holds the same lock as ``commit`` and RE-MERGES: any entry that landed
    after the snapshot (batch id above the folded high-water mark — ids
    are monotone per stream) is carried forward, so a micro-batch commit
    racing the compact is never dropped.

    ``rows`` counts CSV RECORDS (``csv.reader`` semantics, matching
    ``read_ledger_rows``), not physical lines — a quoted field with an
    embedded newline is one row.

    Returns ``{"folded_entries", "upto", "files_before", "files_after",
    "rows"}``; a ledger with nothing new to fold (or no manifest) is a
    no-op that still reports counts."""
    import uuid

    entries = _read_manifest(path)
    files_before = len(_ledger_files(path))
    if not entries:
        return {
            "folded_entries": 0,
            "upto": -1,
            "files_before": files_before,
            "files_after": files_before,
            "rows": 0,
        }
    prior_upto = max((e["compacted_upto"] for e in entries if "compacted_upto" in e), default=-1)
    batch_ids = [e["batch_id"] for e in entries if "batch_id" in e]
    new_upto = max([prior_upto, *batch_ids])
    ordered = sorted(entries, key=lambda e: (0 if "compacted_upto" in e else 1, e.get("batch_id", -1)))
    old_parts = [p for e in ordered for p in e["parts"]]
    name = f"compacted-upto{new_upto}-{uuid.uuid4().hex[:8]}.csv"
    n_rows = 0
    with open(os.path.join(path, name), "w", newline="") as out:
        # Stream records through csv.reader -> csv.writer (never the whole
        # part in memory — parts can be large); record semantics are
        # preserved exactly since readers resolve rows via csv.reader too.
        w = csv.writer(out)
        for part in old_parts:
            with open(os.path.join(path, part), newline="") as pf:
                for rec in csv.reader(pf):
                    w.writerow(rec)
                    n_rows += 1
    snap_parts = set(old_parts)
    with _manifest_lock(path):
        fresh = _read_manifest(path)
        late = [e for e in fresh if e.get("batch_id", -1) > new_upto]
        # A REPLAY of a folded batch id (<= new_upto) that committed between
        # the unlocked snapshot and this locked rewrite is dropped from the
        # manifest (its rows live in the fold via the original parts) — but
        # its freshly written uuid parts would otherwise orphan forever.
        # Collect them here and sweep them with the folded originals.
        dropped_parts = [
            p
            for e in fresh
            if "batch_id" in e and e["batch_id"] <= new_upto
            for p in e["parts"]
            if p not in snap_parts
        ]
        _write_manifest(
            path,
            [{"compacted_upto": new_upto, "parts": [name], "rows": n_rows}, *late],
        )
    for part in [*old_parts, *dropped_parts]:
        try:
            os.remove(os.path.join(path, part))
        except OSError:
            pass
    return {
        "folded_entries": len(entries),
        "upto": new_upto,
        "files_before": files_before,
        "files_after": len(_ledger_files(path)),
        "rows": n_rows,
    }
