"""Monitoring sink (S7): the engine-side replacement for the reference's
matplotlib live chart (``lvmh_forecaster2.py:213-278``).

The reference recomputes min/max/mean over the whole history per refresh
(A2/A3). Here the same figures ride along with the query for free:
``observe()`` attaches aggregates to the plan, and a
``StreamingQueryListener`` receives them per micro-batch — a data feed any
dashboard can tail, with zero extra passes over the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["with_tick_metrics", "TickMetricsListener"]


def with_tick_metrics(ticks: DataFrame, name: str = "tick_metrics") -> DataFrame:
    """Attach the live-plot aggregates (count, min/max/avg value — A2/A3)
    as query-execution observations. Works on batch and streaming frames."""
    return ticks.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.avg("value").alias("avg_value"),
    )


@dataclass
class TickMetricsListener(StreamingQueryListener):
    """Collects per-batch observed metrics + input rates: the chart feed."""

    name: str = "tick_metrics"
    history: list[dict] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        progress = event.progress
        observed = progress.observedMetrics.get(self.name)
        if observed is not None:
            self.history.append(
                {
                    "batch_id": progress.batchId,
                    "num_input_rows": progress.numInputRows,
                    **observed.asDict(),
                }
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
