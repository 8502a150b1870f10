"""Paced replay source (SURVEY.md §2.9 T1) and the message-bus seam
(S8/S9).

The reference's publisher iterates cache rows and publishes one JSON
event per 0.1 s to MQTT, looping forever (publisher.py:45-88). Spark
equivalents, in order of fidelity vs practicality:

- file drip-feed: write the replay as JSONL chunk files; readStream
  .format("text") with maxFilesPerTrigger=1 — deterministic, testable,
  no external broker. This is what the e2e tests use.
- rate source join: readStream.format("rate") rows joined by index to a
  broadcast replay table — true pacing via rowsPerSecond.
- real broker: Kafka source/sink is first-party; MQTT egress via a paho
  foreach sink (MqttForeachSink) and MQTT ingress via MqttFileBridge
  (paho subscriber → JSONL chunk files → file_replay_stream, giving the
  push-callback broker a replayable, checkpointable offset story). Both
  are gated imports — paho is not a baked-in dependency.
"""

from __future__ import annotations

import os
import re
import threading
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_replay_chunks(lines: list[str], out_dir: str, events_per_file: int = 200) -> int:
    """Lay a JSONL replay out as ordered chunk files for the file
    drip-feed source. Returns the number of files."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    base = int(time.time()) - 86_400
    for i in range(0, len(lines), events_per_file):
        path = os.path.join(out_dir, f"chunk-{i // events_per_file:06d}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(lines[i : i + events_per_file]) + "\n")
        # FileStreamSource batches files by modification time; files written
        # in one burst share an mtime tick and replay in arbitrary order.
        # Strictly increasing mtimes make the drip-feed a faithful replay.
        os.utime(path, (base + n, base + n))
        n += 1
    return n


def file_replay_stream(spark: SparkSession, in_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """T1 replay as a streaming text source: one chunk per micro-batch
    (pacing = trigger interval × chunk size, the declarative analog of
    publisher.py:27's 0.1 s sleep)."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(in_dir)
    )


def rate_paced_replay(spark: SparkSession, replay: DataFrame, events_per_second: int = 10) -> DataFrame:
    """T1 with true pacing: rate source (monotonic `value` index) joined
    to the indexed replay table. The replay side is broadcast; each
    micro-batch emits exactly the rows whose index the rate source has
    reached — ~10 events/s matches the reference's publish rate
    (publisher.py:27, BASELINE.md)."""
    indexed = replay.withColumn(
        "__idx", F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1
    ).localCheckpoint(eager=True)
    # eager localCheckpoint: the analyzer rejects nondeterministic exprs
    # (monotonically_increasing_id) anywhere in a streaming plan, and the
    # replay index must be assigned once, not per micro-batch re-plan
    rate = spark.readStream.format("rate").option("rowsPerSecond", events_per_second).load()
    # drop the rate source's columns BY REFERENCE: a replay table may
    # itself carry a `timestamp` or `value` column, which a by-name drop
    # would silently take with it
    return rate.join(F.broadcast(indexed), rate["value"] == indexed["__idx"], "inner").drop(
        rate["timestamp"], rate["value"], indexed["__idx"]
    )


def _require_paho() -> None:
    try:
        import paho.mqtt.client  # noqa: F401
    except ImportError as e:  # pragma: no cover - paho not baked in
        raise ImportError("paho-mqtt is required for MQTT sources/sinks") from e


def make_paho_client():
    """Version-adaptive paho client construction: paho-mqtt ≥ 2.0 raises
    VersionMismatchError on the no-arg constructor (the reference pins
    CallbackAPIVersion.VERSION2, dashboard.py:418), paho 1.x has no
    CallbackAPIVersion at all — support both."""
    import paho.mqtt.client as mqtt

    try:
        return mqtt.Client(mqtt.CallbackAPIVersion.VERSION2)  # paho >= 2.0
    except AttributeError:  # paho 1.x
        return mqtt.Client()


class MqttForeachSink:
    """S8: QoS-1 MQTT publish sink for writeStream.foreach(...).

    One client per partition-epoch (open/process/close contract).
    Gated import: paho-mqtt is optional; constructing the sink without
    it raises ImportError at plan time, not inside executors.
    """

    def __init__(self, broker: str, port: int, topic: str, qos: int = 1):
        _require_paho()
        self.broker, self.port, self.topic, self.qos = broker, port, topic, qos

    def open(self, partition_id: int, epoch_id: int) -> bool:  # pragma: no cover
        self._client = make_paho_client()
        self._client.connect(self.broker, self.port)
        self._client.loop_start()
        return True

    def process(self, row) -> None:  # pragma: no cover
        # bounded wait: a broker disconnect mid-batch otherwise blocks
        # the executor task forever (paho queues the QoS-1 publish and
        # waits for a PUBACK that never comes); raising converts the
        # hang into a retryable task failure
        info = self._client.publish(self.topic, row["json"], qos=self.qos)
        info.wait_for_publish(timeout=30)
        if not info.is_published():
            raise TimeoutError(
                f"MQTT publish not acked within 30s (mid={info.mid})"
            )

    def close(self, error) -> None:  # pragma: no cover
        self._client.loop_stop()
        self._client.disconnect()


class MqttFileBridge:
    """S9: MQTT subscribe source, as a broker → file-source bridge.

    The reference's dashboard is a raw paho subscriber feeding in-memory
    deques (dashboard.py:418-445). Spark's streaming sources need
    replayable offsets, which a push callback can't provide — so the
    ingress path is: paho subscriber (this class, driver-side or a
    sidecar process) appends received payloads to JSONL chunk files with
    strictly increasing mtimes, and `file_replay_stream` over the same
    directory turns them into a checkpointable stream. At-least-once
    from QoS-1 composes with `windows.dedup_events` downstream into
    effective exactly-once — stronger than the reference, which loses
    its buffer on restart.

    `client_factory` is injectable for broker-less tests; the default
    builds a real (version-adaptive) paho client. Gated import like
    MqttForeachSink: constructing without paho raises at plan time.
    """

    def __init__(
        self,
        broker: str,
        port: int,
        topic: str,
        out_dir: str,
        qos: int = 1,
        flush_every: int = 100,
        client_factory=None,
    ):
        if client_factory is None:
            _require_paho()
            client_factory = make_paho_client
        self.broker, self.port, self.topic, self.qos = broker, port, topic, qos
        self.out_dir, self.flush_every = out_dir, flush_every
        self._client_factory = client_factory
        self._buf: list[str] = []
        self._lock = threading.Lock()
        os.makedirs(out_dir, exist_ok=True)
        # RESUME numbering past any chunks already in out_dir: a
        # restarted bridge starting at 0 would overwrite
        # mqtt-000000.jsonl — a path FileStreamSource has already
        # committed and will never re-read, silently losing both the
        # clobbered old chunk and every new payload written into it
        existing = [
            int(m.group(1))
            for f in os.listdir(out_dir)
            if (m := re.match(r"mqtt-(\d{6})\.jsonl$", f))
        ]
        self._n = max(existing) + 1 if existing else 0
        self._base = int(time.time()) - 86_400 + self._n

    # paho on_message signature is identical in the v1 and v2 callback APIs
    def _on_message(self, client, userdata, msg) -> None:
        with self._lock:
            self._buf.append(msg.payload.decode("utf-8"))
            if len(self._buf) >= self.flush_every:
                self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buf:
            return
        path = os.path.join(self.out_dir, f"mqtt-{self._n:06d}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(self._buf) + "\n")
        # strictly increasing mtimes: FileStreamSource orders by mtime
        # (same contract as write_replay_chunks)
        os.utime(path, (self._base + self._n, self._base + self._n))
        self._n += 1
        self._buf = []

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def start(self) -> None:
        self._client = self._client_factory()
        self._client.on_message = self._on_message
        self._client.connect(self.broker, self.port)
        self._client.subscribe(self.topic, qos=self.qos)
        self._client.loop_start()

    def stop(self) -> None:
        self._client.loop_stop()
        self._client.disconnect()
        self.flush()
