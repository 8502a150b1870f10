"""Streaming observability: a StreamingQueryListener that folds each
micro-batch's progress event into in-memory per-query metrics — the
rows/sec, batch-duration, and state-store numbers an operator watches
in production (the reference's only observability is print counters,
publisher.py:82; Spark emits structured progress the engine should
surface, not discard).

Driver-side by design: progress events are per-query control-plane
metadata (one dict per micro-batch), not data-plane rows — recording
them costs nothing at any scale.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects per-batch progress for every query while attached.

    Usage::

        rec = ProgressRecorder()
        spark.streams.addListener(rec)
        ... run queries ...
        spark.streams.removeListener(rec)
        rec.summary(query_id)  # {'n_batches', 'input_rows', 'max_batch_s', ...}
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._progress: dict[str, list[dict]] = {}
        self._terminated: dict[str, str | None] = {}

    # StreamingQueryListener contract ------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        with self._lock:
            self._progress.setdefault(str(event.id), [])

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = json.loads(p.json) if hasattr(p, "json") else dict(p)
        with self._lock:
            self._progress.setdefault(str(row.get("id")), []).append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self._terminated[str(event.id)] = event.exception

    # Read side -----------------------------------------------------------
    def batches(self, query_id: str) -> list[dict]:
        with self._lock:
            return list(self._progress.get(str(query_id), []))

    def summary(self, query_id: str) -> dict:
        rows = self.batches(query_id)
        n_input = sum(int(r.get("numInputRows") or 0) for r in rows)
        durs = [
            int(r.get("batchDuration") or r.get("durationMs", {}).get("triggerExecution") or 0)
            for r in rows
        ]
        return {
            "n_batches": len(rows),
            "input_rows": n_input,
            "max_batch_ms": max(durs, default=0),
            "total_batch_ms": sum(durs),
            "terminated_with_error": bool(self._terminated.get(str(query_id))),
        }
