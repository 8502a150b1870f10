"""Spark 4 Python Data Source for the REST extraction surface (S1/S2):
`spark.read.format("oe_rest")` with one input partition per facility-code
batch, so the fetch fan-out runs ON EXECUTORS — the reference extracts
serially in one process (extractor.py:100-136), and even the engine's
driver-side `sources.extract.fetch_facility_data` is a loop; this makes
ingest itself horizontally scalable (1000 partitions = 1000 concurrent
fetchers with Spark task retries as the retry layer on top of the
in-partition S3 retry wrapper).

The landing schema is raw (batch_index, url, status, body) — the engine's
normalizers (extract.facility_responses_to_long) take it from there, so
quarantine/validation semantics are identical to the file-landed path.

Transports (options are strings, so the transport is selected by URI):
- ``transport=https`` — real urllib GET (no such endpoint in the test
  container; exists for production parity).
- ``transport=fake:<seed>`` — deterministic synthetic OE-shaped payload
  per batch (tests; no network).
- ``transport=file:<dir>`` — replay landed JSON batch files by index
  (the reference's own landing layout).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

LANDING_SCHEMA = "batch_index int, url string, status int, body string"


class RestBatchPartition(InputPartition):
    def __init__(self, index: int, url: str):
        self.index = index
        self.url = url


def _fake_body(seed: int, index: int, codes: list[str]) -> dict:
    """Deterministic OE-shaped response for a batch of codes (matches
    extract.RESPONSE_SCHEMA: data → metric blocks → per-series results
    → [timestamp, value] pairs): one power + one emissions series per
    code, values a pure function of (seed, code, metric, t)."""
    data = []
    for metric in ("power", "emissions"):
        results = []
        for code in codes:
            base = (seed * 1_000_003 + sum(map(ord, code)) * 97) % 500
            pairs = [
                [
                    f"2024-01-01T00:{5 * t:02d}:00+10:00",
                    str(round((base + 13 * t + (7 if metric == "power" else 3)) % 997 / 10.0, 1)),
                ]
                for t in range(3)
            ]
            results.append(
                {"name": f"{metric}_{code}", "columns": {"unit_code": code}, "data": pairs}
            )
        data.append({"metric": metric, "results": results})
    return {"data": data}


class RestBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.base_url = options.get("base_url", "https://api.example.invalid")
        self.codes = [c for c in options.get("codes", "").split(",") if c]
        self.batch_size = int(options.get("batch_size", "25"))
        self.date_start = options.get("date_start", "2024-01-01")
        self.date_end = options.get("date_end", "2024-01-08")
        self.transport = options.get("transport", "https")

    def _batches(self) -> list[list[str]]:
        from .extract import batch_codes

        return batch_codes(self.codes, self.batch_size)

    def partitions(self):
        from .extract import build_query_string

        parts = []
        for i, batch in enumerate(self._batches()):
            qs = build_query_string(
                interval="5m",
                metrics=["power", "emissions"],
                date_start=self.date_start,
                date_end=self.date_end,
                facility_code=batch,
            )
            parts.append(RestBatchPartition(i, f"{self.base_url}/data/facilities/NEM{qs}"))
        return parts

    def read(self, partition: RestBatchPartition):
        # Runs on an EXECUTOR: one fetch per partition, Spark task retry
        # + in-partition retry wrapper (extract.fetch_with_retry) on top.
        batch = self._batches()[partition.index]
        if self.transport.startswith("fake:"):
            seed = int(self.transport.split(":", 1)[1])
            body = _fake_body(seed, partition.index, batch)
            yield (partition.index, partition.url, 200, json.dumps(body))
            return
        if self.transport.startswith("file:"):
            root = self.transport.split(":", 1)[1]
            try:
                with open(f"{root}/batch_{partition.index:05d}.json") as f:
                    yield (partition.index, partition.url, 200, f.read())
            except FileNotFoundError:
                yield (partition.index, partition.url, 404, None)
            return
        from urllib.request import urlopen  # production path; no endpoint in tests

        from .extract import fetch_with_retry

        def transport(url: str):
            try:
                with urlopen(url, timeout=30) as resp:
                    return resp.status, json.loads(resp.read())
            except Exception:
                return 500, None

        resp = fetch_with_retry(transport, partition.url)
        status = 200 if resp is not None else 500
        yield (partition.index, partition.url, status, json.dumps(resp) if resp else None)


class RestBatchDataSource(DataSource):
    """spark.read.format("oe_rest") — register with
    spark.dataSource.register(RestBatchDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "oe_rest"

    def schema(self) -> str:
        return LANDING_SCHEMA

    def reader(self, schema) -> RestBatchReader:
        return RestBatchReader(self.options)


# ---------------------------------------------------------------------------
# Streaming: deterministic event replay as a Python streaming source
# ---------------------------------------------------------------------------


class _ReplayStreamReader:
    """SimpleDataSourceStreamReader over a JSONL event file: offset =
    line index, each micro-batch emits the next `events_per_batch`
    lines as (value string) rows — the MQTT-subscribe stand-in
    (SURVEY §7.3) as a FIRST-CLASS source format instead of a helper
    (streaming/replay.py file_replay_stream needs pre-chunked files;
    this replays one landed file with exactly-once offsets the
    checkpoint owns, and readBetweenOffsets makes batch replay
    deterministic for recovery)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.per_batch = int(options.get("events_per_batch", "100"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _lines(self) -> list[str]:
        with open(self.path) as f:
            return [ln.rstrip("\n") for ln in f if ln.strip()]

    def read(self, start: dict):
        lines = self._lines()
        i = start["index"]
        j = min(i + self.per_batch, len(lines))
        return iter([(ln,) for ln in lines[i:j]]), {"index": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        lines = self._lines()
        return iter([(ln,) for ln in lines[start["index"] : end["index"]]])

    def commit(self, end: dict) -> None:
        pass  # source is a static file; nothing to evict


class ReplayStreamDataSource(DataSource):
    """spark.readStream.format("oe_replay").option("path", ...) — raw
    event lines; downstream is the same parse→validate→route plan as
    every other ingress (streaming/ingest.py)."""

    @classmethod
    def name(cls) -> str:
        return "oe_replay"

    def schema(self) -> str:
        return "value string"

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        # _ReplayStreamReader first: SimpleDataSourceStreamReader's
        # defaults raise NotImplemented and must lose the MRO race.
        class Reader(_ReplayStreamReader, SimpleDataSourceStreamReader):
            def __init__(inner):
                _ReplayStreamReader.__init__(inner, self.options)

        return Reader()


# ---------------------------------------------------------------------------
# Python DataSource WRITE path: a JSONL sink with a two-phase commit
# ---------------------------------------------------------------------------


class JsonlSinkDataSource(DataSource):
    """df.write.format("oe_jsonl").mode(...).save(path) — the write half
    of the Spark 4 Python DataSource surface (the read half is
    RestBatchDataSource/ReplayStreamDataSource above). Each task writes
    its partition to a uniquely-named part file and returns a commit
    message (file, row count); the DRIVER's commit() then writes the
    `_MANIFEST.json` naming exactly the committed files. Readers that
    resolve the manifest first never see output from failed/speculative
    task attempts — the same task-commit discipline FileOutputCommitter
    gives JVM sinks, reduced to its essentials. abort() removes
    part files from failed attempts.

    The payload column contract matches the publisher tier: one
    `value` string column (to_json upstream), one JSON line per row —
    i.e. the file format MQTT/Kafka replay fixtures consume."""

    @classmethod
    def name(cls) -> str:
        return "oe_jsonl"

    def writer(self, schema, overwrite: bool):
        if [f.name for f in schema.fields] != ["value"]:
            raise ValueError(
                "oe_jsonl expects exactly one 'value' string column; "
                "to_json(struct(...)) upstream produces it"
            )
        return _JsonlWriter(self.options, overwrite)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("oe_jsonl requires .option('path', ...) or save(path)")
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write((row.value or "") + "\n")
                n += 1
        return _JsonlCommit(name, n)

    def commit(self, messages):
        import json as _json
        import os

        ok = [m for m in messages if m is not None]
        manifest = {
            "files": sorted(
                ({"path": m.path, "n_rows": m.n_rows} for m in ok),
                key=lambda d: d["path"],
            ),
            "n_rows": sum(m.n_rows for m in ok),
        }
        tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        import os

        for m in (m for m in messages if m is not None):
            try:
                os.remove(os.path.join(self.path, m.path))
            except OSError:
                pass


def read_jsonl_sink(spark, path: str):
    """Manifest-resolved read-back: only files the commit named."""
    import json as _json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    files = [os.path.join(path, d["path"]) for d in manifest["files"]]
    if not files:
        return spark.createDataFrame([], "value string"), manifest
    return spark.read.schema("value string").text(files).withColumnRenamed(
        "value", "value"
    ), manifest
