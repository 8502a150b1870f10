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
- real broker: Kafka source/sink is first-party; MQTT via a paho
  foreach sink (gated import — paho is not a baked-in dependency).
"""

from __future__ import annotations

import os
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
    return rate.join(F.broadcast(indexed), rate["value"] == indexed["__idx"], "inner").drop(
        "__idx", "timestamp", "value"
    )


class MqttForeachSink:
    """S8: QoS-1 MQTT publish sink for writeStream.foreach(...).

    One client per partition-epoch (open/process/close contract).
    Gated import: paho-mqtt is optional; constructing the sink without
    it raises ImportError at plan time, not inside executors.
    """

    def __init__(self, broker: str, port: int, topic: str, qos: int = 1):
        try:
            import paho.mqtt.client  # noqa: F401
        except ImportError as e:  # pragma: no cover - paho not baked in
            raise ImportError("paho-mqtt is required for MqttForeachSink") from e
        self.broker, self.port, self.topic, self.qos = broker, port, topic, qos

    def open(self, partition_id: int, epoch_id: int) -> bool:  # pragma: no cover
        import paho.mqtt.client as mqtt

        self._client = mqtt.Client()
        self._client.connect(self.broker, self.port)
        self._client.loop_start()
        return True

    def process(self, row) -> None:  # pragma: no cover
        self._client.publish(self.topic, row["json"], qos=self.qos).wait_for_publish()

    def close(self, error) -> None:  # pragma: no cover
        self._client.loop_stop()
        self._client.disconnect()
