"""Metrics & health (≙ C6: statistics/statistics.go:36-136 — 14 Prometheus
counters/gauges; /state /ready /live endpoints).

Spark-first mapping:

- row-level counters (ConsumeMsgsTotal, ParseMsgsErrorTotal,
  FlushMsgsTotal, RingMsgsOffTotal...) → ``df.observe`` named metrics,
  collected per micro-batch with zero extra passes (they piggyback on the
  existing plan).
- pipeline gauges (lag, batch duration) → ``StreamingQueryListener``
  progress events (Spark already tracks inputRowsPerSecond,
  processedRowsPerSecond, batchDuration, state operator memory).
- health endpoints → ``query.status`` / ``query.isActive``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["observe_counters", "CounterListener"]


def observe_counters(df: DataFrame, name: str = "sinker") -> DataFrame:
    """Attach the reference's row counters to a (streaming) DataFrame:
    consumed rows, parse errors (null __parsed), null-rejects pending.
    Read them from the listener's observedMetrics[name]."""
    cols = [F.count(F.lit(1)).alias("consume_msgs_total")]
    if "__parsed" in df.columns:
        cols.append(
            F.sum(F.when(F.col("__parsed").isNull(), 1).otherwise(0)).alias("parse_msgs_error_total")
        )
    return df.observe(name, *cols)


@dataclass
class CounterListener(StreamingQueryListener):
    """Collects observed metrics + engine progress per batch (the
    Prometheus-exporter seam; statistics/statistics.go pushes these —
    here they accumulate and a scraper reads ``snapshot()``)."""

    totals: dict = field(default_factory=dict)
    last_progress: dict = field(default_factory=dict)

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.last_progress[p.name or p.id] = {
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "numInputRows": p.numInputRows,
        }
        for obs_name, metrics in (p.observedMetrics or {}).items():
            tot = self.totals.setdefault(obs_name, {})
            for k in metrics.asDict():
                v = metrics[k]
                if isinstance(v, (int, float)) and v is not None:
                    tot[k] = tot.get(k, 0) + v

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def snapshot(self) -> dict:
        return {"totals": dict(self.totals), "progress": dict(self.last_progress)}
