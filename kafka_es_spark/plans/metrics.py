"""W2 — metrics surface (reference: kafka-es-runner Metrics.kt:24-83).

The reference exports requests/actions/bytes/time/errors counters into the
Connect metrics registry. Spark-first translation: executor-side counts
flow through Spark accumulators (updated inside the Arrow-batched UDFs,
merged on the driver as tasks finish), the manifest keeps the durable
per-stage values, and ``to_prometheus_text`` renders the standard
Prometheus exposition format for a scraper/pushgateway.

Accumulator caveat (documented Spark semantics): task retries can
double-count accumulator updates in transformations, so these are
OBSERVABILITY numbers; the authoritative counters are the manifest's,
computed from the written data (plans/build_index.py)."""

from __future__ import annotations

import time

from pyspark.sql import SparkSession


class BuildMetrics:
    """Counters for one index build/epoch: documents and tokens seen by the
    inverter, posting rows shuffled, segment rows and compressed bytes
    written, per-stage wall time."""

    COUNTERS = ("docs", "tokens", "postings", "segments", "posting_bytes", "errors")

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self._acc = {n: sc.accumulator(0) for n in self.COUNTERS}
        self._t0 = time.time()
        self.stage_sec: dict[str, float] = {}

    def add(self, name: str, v: int) -> None:
        self._acc[name].add(int(v))

    def record_stage(self, name: str, seconds: float) -> None:
        self.stage_sec[name] = round(seconds, 3)

    def as_dict(self) -> dict:
        d = {n: int(a.value) for n, a in self._acc.items()}
        d["elapsed_sec"] = round(time.time() - self._t0, 3)
        d["stages"] = dict(self.stage_sec)
        return d

    def to_prometheus_text(self, prefix: str = "kes_build") -> str:
        """Prometheus exposition format (one scrape's worth)."""
        lines = []
        for n, a in self._acc.items():
            lines.append(f"# TYPE {prefix}_{n}_total counter")
            lines.append(f"{prefix}_{n}_total {int(a.value)}")
        for stage, sec in self.stage_sec.items():
            lines.append(f'{prefix}_stage_seconds{{stage="{stage}"}} {sec}')
        return "\n".join(lines) + "\n"
