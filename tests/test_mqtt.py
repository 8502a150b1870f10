"""MQTT seam tests without a live broker (paho-mqtt is not baked into
the env): a fake in-memory broker wires MqttForeachSink (S8 egress)
straight into MqttFileBridge (S9 ingress), exercising the real
publish → subscribe → chunk-file → file_replay_stream path end-to-end
(reference: dashboard.py:418-445 subscriber, publisher.py:45-88).
Version-adaptive paho client construction is pinned against both the
2.x (CallbackAPIVersion required) and 1.x (no-arg) constructor shapes.
"""

from __future__ import annotations

import sys
import types

import pytest

from assignment_2_dataengineering_spark.streaming import ingest, replay
from tests.fixtures import nem


class _FakeMsg:
    def __init__(self, payload: bytes):
        self.payload = payload


class _FakeBroker:
    """Routes publishes to subscribed clients synchronously."""

    def __init__(self):
        self.subs: list[tuple[str, "_FakeClient"]] = []

    def route(self, topic: str, payload: str) -> None:
        for t, client in self.subs:
            if t == topic and client.on_message is not None:
                client.on_message(client, None, _FakeMsg(payload.encode("utf-8")))


class _FakePubInfo:
    def wait_for_publish(self, timeout=None):
        pass

    def is_published(self):
        return True


class _FakeClient:
    def __init__(self, broker: _FakeBroker):
        self._broker = broker
        self.on_message = None

    def connect(self, host, port):
        pass

    def subscribe(self, topic, qos=0):
        self._broker.subs.append((topic, self))

    def publish(self, topic, payload, qos=0):
        self._broker.route(topic, payload)
        return _FakePubInfo()

    def loop_start(self):
        pass

    def loop_stop(self):
        pass

    def disconnect(self):
        pass


def _install_fake_paho(monkeypatch, broker: _FakeBroker, api: str) -> None:
    """Register a fake paho.mqtt.client in sys.modules. api='v2' mimics
    paho >= 2.0 (constructor REQUIRES CallbackAPIVersion); api='v1'
    mimics paho 1.x (no-arg constructor, no CallbackAPIVersion)."""
    mod = types.ModuleType("paho.mqtt.client")
    if api == "v2":
        class CallbackAPIVersion:
            VERSION1 = 1
            VERSION2 = 2

        def Client(callback_api_version=None, *a, **kw):
            if callback_api_version is None:
                raise ValueError("Unsupported callback API version")  # paho2's VersionMismatchError shape
            return _FakeClient(broker)

        mod.CallbackAPIVersion = CallbackAPIVersion
        mod.Client = Client
    else:
        def Client(*a, **kw):
            if a or kw:
                raise TypeError("Client() takes no arguments in paho 1.x")
            return _FakeClient(broker)

        mod.Client = Client
    paho = types.ModuleType("paho")
    paho_mqtt = types.ModuleType("paho.mqtt")
    paho.mqtt = paho_mqtt
    paho_mqtt.client = mod
    monkeypatch.setitem(sys.modules, "paho", paho)
    monkeypatch.setitem(sys.modules, "paho.mqtt", paho_mqtt)
    monkeypatch.setitem(sys.modules, "paho.mqtt.client", mod)


@pytest.mark.parametrize("api", ["v1", "v2"])
def test_make_paho_client_version_adaptive(monkeypatch, api):
    """paho >= 2.0 raises on the no-arg constructor; 1.x has no
    CallbackAPIVersion — make_paho_client must handle both."""
    _install_fake_paho(monkeypatch, _FakeBroker(), api)
    client = replay.make_paho_client()
    assert isinstance(client, _FakeClient)


def test_mqtt_loopback_sink_to_bridge_to_stream(spark, monkeypatch, tmp_path_factory):
    """S8→S9 loopback: foreach-sink publishes fixture events through the
    fake broker into the file bridge; the resulting chunk files feed
    file_replay_stream and every event survives the full path."""
    broker = _FakeBroker()
    _install_fake_paho(monkeypatch, broker, "v2")
    out_dir = str(tmp_path_factory.mktemp("mqtt_in"))

    bridge = replay.MqttFileBridge("broker.local", 1883, "nem/events", out_dir, flush_every=50)
    bridge.start()

    sink = replay.MqttForeachSink("broker.local", 1883, "nem/events", qos=1)
    assert sink.open(partition_id=0, epoch_id=0)
    lines = nem.event_stream()[:120]
    for l in lines:
        sink.process({"json": l})
    sink.close(None)
    bridge.stop()  # flushes the 20-message tail

    import os

    files = sorted(os.listdir(out_dir))
    assert len(files) == 3  # 50 + 50 + 20
    mtimes = [os.path.getmtime(os.path.join(out_dir, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)

    stream = replay.file_replay_stream(spark, out_dir)
    parsed = ingest.parse_events(stream)
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("mqtt_bridge_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt_mqtt")))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from mqtt_bridge_sink")
    assert got.count() == len(lines)
    # every published payload arrived intact, and branch routing over the
    # bridged stream matches the batch path over the same lines
    assert sorted(r.raw for r in got.select("raw").collect()) == sorted(lines)
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    want = ingest.parse_events(raw)
    branch_counts = lambda df: (
        ingest.facility_branch(df).count(),
        ingest.market_branch(df).count(),
        ingest.quarantine_branch(df).count(),
    )
    assert branch_counts(got) == branch_counts(want)


def test_bridge_requires_paho_without_factory(monkeypatch):
    """S9 gating mirrors S8: constructing the bridge without paho and
    without an injected client factory fails at plan time."""
    import builtins

    real_import = builtins.__import__

    def no_paho(name, *a, **kw):
        if name.startswith("paho"):
            raise ImportError("paho not installed")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_paho)
    with pytest.raises(ImportError, match="paho-mqtt is required"):
        replay.MqttFileBridge("b", 1883, "t", "/tmp/x")
