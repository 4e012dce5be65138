"""Streaming observability: a ``StreamingQueryListener`` that captures the
per-micro-batch health metrics the reference exports through its Prometheus
servlet sinks (``infrastructure/spark/metrics.properties:1-8``,
``infrastructure/prometheus/prometheus.yml:22-33``) — input rows, processed
rows/sec, batch duration, watermark, and state-store size — without any
external infrastructure.

This is the one custom-code component SURVEY §4 sanctions beyond stock
DataFrame plans ("a custom StreamingQueryListener for Prometheus-style
metrics parity").  The listener is pure driver-side bookkeeping: metrics
events arrive on Spark's listener bus, so attaching it costs the hot path
nothing.  At scale the same records feed a Prometheus pushgateway or a
metrics topic; here they land in memory and are queryable as a DataFrame —
the engine's answer to the reference's Grafana panels
(``ecommerce-streaming.json:55-346``).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    processed_rows_per_sec: float
    batch_duration_ms: int
    watermark: str
    state_rows: int
    state_memory_bytes: int
    rows_dropped_by_watermark: int = 0


@dataclass
class MetricsCollector(StreamingQueryListener):
    """Collects one ``BatchMetric`` per completed micro-batch.

    Thread-safe: progress events fire on the listener-bus thread while the
    test/driver thread reads.  ``attach``/``detach`` manage registration so
    collectors don't leak across queries.
    """

    records: list = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        # sum across ALL stateful operators: a multi-stateful query (dedup →
        # window agg, or a chained stream-stream join) reports one entry per
        # operator, and total state is the number that must plateau under
        # watermark eviction
        ops = p.stateOperators or []
        m = BatchMetric(
            query_name=p.name or "",
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            processed_rows_per_sec=float(p.processedRowsPerSecond or 0.0),
            batch_duration_ms=int(p.batchDuration),
            watermark=(p.eventTime or {}).get("watermark", ""),
            state_rows=sum(int(s.numRowsTotal) for s in ops),
            state_memory_bytes=sum(int(s.memoryUsedBytes) for s in ops),
            rows_dropped_by_watermark=sum(
                int(s.numRowsDroppedByWatermark) for s in ops
            ),
        )
        with self._lock:
            self.records.append(m)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- driver-side access ------------------------------------------------
    def attach(self, spark: SparkSession) -> "MetricsCollector":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The captured metrics as a relation — the queryable surface the
        reference delegates to Prometheus/Grafana."""
        with self._lock:
            rows = [
                (
                    m.query_name,
                    m.batch_id,
                    m.num_input_rows,
                    m.processed_rows_per_sec,
                    m.batch_duration_ms,
                    m.watermark,
                    m.state_rows,
                    m.state_memory_bytes,
                    m.rows_dropped_by_watermark,
                )
                for m in self.records
            ]
        return spark.createDataFrame(
            rows,
            "query_name string, batch_id long, num_input_rows long, "
            "processed_rows_per_sec double, batch_duration_ms long, "
            "watermark string, state_rows long, state_memory_bytes long, "
            "rows_dropped_by_watermark long",
        )
