"""Streaming point-in-time feature serving — the stateful twin of
`ml_point_in_time_features` (operators/asof.py), completing the
training-set-construction family's batch/stream parity story the way
KS (drift_stream.py), CMS (sketch_stream.py) and Kalman (stateful.py)
already have it.

Batch semantics being mirrored: each label (purchase tick) joins its
user's most recent COMPLETED-day feature snapshot (daily tick count +
exact integer-cent mean), where a day's features become available only at
the FOLLOWING midnight — same-day ticks can never leak into a label's
features, cold-start labels keep NULLs.

Streaming form: per-user state is two tiny tuples — the running aggregate
of the user's latest (still open) day, and the published snapshot of the
most recent completed day. An arriving tick whose day is newer than the
open day publishes the open aggregate and opens a new one; an arriving
label is served the published snapshot. Because a tick in day D arrives at
or after D's midnight, "published" is exactly "available" under the
next-midnight rule — no timers needed, availability is implied by
event-time order (the file drop-zone's delivery contract, see
stateful.py's module docstring; out-of-order streams need the watermarked
window operators instead).

State is O(1) per key (6 scalars) regardless of history — the feature
-store pattern at 100 TB: labels never re-scan history, features fold
incrementally. Sums are integer CENTS end-to-end, so the served
``feat_mean`` is bit-identical to the batch as-of join's
(``tests/test_feature_store_stream.py`` pins value-exact parity).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stateful import _collect_batch

__all__ = ["streaming_point_in_time_features"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("label_value", T.DoubleType()),
        T.StructField("feat_day", T.StringType()),
        T.StructField("feat_n", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
    ]
)

# (open_day, open_n, open_sum_cents, pub_day, pub_n, pub_sum_cents);
# days as int64 ordinals (days since epoch), -1 = absent.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_day", T.LongType()),
        T.StructField("open_n", T.LongType()),
        T.StructField("open_sum", T.LongType()),
        T.StructField("pub_day", T.LongType()),
        T.StructField("pub_n", T.LongType()),
        T.StructField("pub_sum", T.LongType()),
    ]
)

_NS_PER_DAY = 86_400_000_000_000


def _serve_batch(
    user_id, pdf: pd.DataFrame, st: tuple
) -> tuple[pd.DataFrame | None, tuple]:
    """Day-group scan over one event-time-sorted micro-batch: publish open
    aggregates at day rollover, serve labels from the published snapshot,
    fold every tick into the open aggregate. Loop count = distinct days in
    the batch, not rows; per-day work is vectorized pandas."""
    open_day, open_n, open_sum, pub_day, pub_n, pub_sum = st
    days = pdf["ts"].values.astype("datetime64[ns]").astype("int64") // _NS_PER_DAY
    cents = (pdf["value"] * 100).round().astype("int64")
    is_label = (pdf["event_type"] == "purchase").values
    outs = []
    for day in pd.unique(days):
        sel = days == day
        if open_day != -1 and open_day < day:
            pub_day, pub_n, pub_sum = open_day, open_n, open_sum
            open_day, open_n, open_sum = day, 0, 0
        elif open_day == -1:
            open_day, open_n, open_sum = day, 0, 0
        lsel = sel & is_label
        if lsel.any():
            lab = pdf.loc[lsel, ["event_id", "ts", "value"]].copy()
            lab.insert(0, "user_id", user_id)
            lab = lab.rename(columns={"value": "label_value"})
            if pub_day != -1:
                lab["feat_day"] = pd.Timestamp(pub_day * _NS_PER_DAY).strftime(
                    "%Y-%m-%d"
                )
                lab["feat_n"] = pub_n
                lab["feat_mean"] = float(pub_sum) / (100.0 * pub_n)
            else:
                lab["feat_day"] = None
                lab["feat_n"] = None
                lab["feat_mean"] = None
            outs.append(lab)
        open_n += int(sel.sum())
        open_sum += int(cents[sel].sum())
    out = pd.concat(outs, ignore_index=True) if outs else None
    return out, (open_day, open_n, open_sum, pub_day, pub_n, pub_sum)


def _apply_serve(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    st = state.get if state.exists else (-1, 0, 0, -1, 0, 0)
    pdf = _collect_batch(pdfs)
    if pdf is not None:
        out, st = _serve_batch(user_id, pdf, st)
        state.update(st)
        if out is not None:
            yield out
    else:
        state.update(st)


def streaming_point_in_time_features(events: DataFrame) -> DataFrame:
    """Point-in-time-correct training rows over an unbounded keyed event
    stream: every purchase is emitted with its user's most recent
    completed-day feature snapshot, leak-free by construction."""
    return events.groupBy("user_id").applyInPandasWithState(
        _apply_serve,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
