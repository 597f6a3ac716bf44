"""HTTP health/metrics endpoints + pushgateway pusher (C6 transport half;
reference: cmd/clickhouse_sinker/main.go:163-237, statistics/statistics.go)."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from clickhouse_sinker_spark.streaming.http_health import (
    HealthServer,
    MetricsPusher,
    prometheus_text,
)

SNAP = {
    "totals": {"taskA": {"consume_msgs_total": 120, "parse_msgs_error_total": 3}},
    "progress": {"taskA": {"numInputRows": 40, "inputRowsPerSecond": 13.5}},
}


def test_prometheus_text_rendering():
    text = prometheus_text(SNAP)
    assert '# TYPE clickhouse_sinker_consume_msgs_total counter' in text
    assert 'clickhouse_sinker_consume_msgs_total{task="taskA"} 120.0' in text
    assert 'clickhouse_sinker_parse_msgs_error_total{task="taskA"} 3.0' in text
    assert 'clickhouse_sinker_input_rows_per_second{task="taskA"} 13.5' in text


@pytest.fixture()
def health():
    state = {"t1": {"state": "RUN", "lag": 5}, "t2": {"state": "RUN", "lag": 0}}
    srv = HealthServer(lambda: SNAP, lambda: state)
    srv.start()
    try:
        yield srv, state
    finally:
        srv.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, r.read().decode()


def test_endpoints(health):
    srv, state = health
    code, body = _get(srv.port, "/")
    assert code == 200 and "/state" in body and "/metrics" in body
    code, body = _get(srv.port, "/metrics")
    assert code == 200 and "clickhouse_sinker_consume_msgs_total" in body
    code, body = _get(srv.port, "/state")
    assert code == 200 and json.loads(body)["t1"]["lag"] == 5
    code, body = _get(srv.port, "/ready")
    assert code == 200 and json.loads(body) == {"status": "ok"}
    code, body = _get(srv.port, "/ready?full=1")
    assert json.loads(body)["tasks"]["t2"]["state"] == "RUN"
    code, body = _get(srv.port, "/live")
    assert code == 200

    # one task dies → ready flips to 503, live stays ok (main.go semantics)
    state["t2"]["state"] = "DEAD"
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv.port, "/ready")
    assert e.value.code == 503
    code, _ = _get(srv.port, "/live")
    assert code == 200


class _FakeGateway(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _handle(self, method):
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length).decode() if length else ""
        self.server.calls.append((method, self.path, body))
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_PUT(self):
        self._handle("PUT")

    def do_DELETE(self):
        self._handle("DELETE")


@pytest.fixture()
def gateway():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeGateway)
    srv.calls = []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def test_pusher_push_and_delete_on_stop(gateway):
    addr = f"127.0.0.1:{gateway.server_address[1]}"
    p = MetricsPusher([addr], 9999, "10.0.0.1:2112", lambda: prometheus_text(SNAP))
    assert p.push_once() is True
    p.stop()  # no thread started; still sends the DELETE
    methods = [m for m, _, _ in gateway.calls]
    assert methods == ["PUT", "DELETE"]
    m, path, body = gateway.calls[0]
    assert path == "/metrics/job/clickhouse_sinker/instance/10.0.0.1%3A2112"
    assert "clickhouse_sinker_consume_msgs_total" in body


def test_pusher_rotates_address_on_failure(gateway):
    good = f"127.0.0.1:{gateway.server_address[1]}"
    p = MetricsPusher(["127.0.0.1:1", good], 9999, "i1", lambda: "x 1\n", timeout=0.4)
    assert p.push_once() is False  # dead gateway → rotate
    assert p.push_once() is True  # second address works
    assert [m for m, _, _ in gateway.calls] == ["PUT"]


def test_pusher_validates_config():
    with pytest.raises(ValueError):
        MetricsPusher([], 10, "i", lambda: "")
    with pytest.raises(ValueError):
        MetricsPusher(["a"], 0, "i", lambda: "")


def test_prometheus_families_are_contiguous():
    """Exposition format: all samples of a metric family must form one
    contiguous block after its # TYPE line (strict parsers reject
    interleaved families) — advice r5."""
    snap = {
        "totals": {
            "task_a": {"consume_msgs_total": 1, "flush_msgs_total": 2},
            "task_b": {"consume_msgs_total": 3, "flush_msgs_total": 4},
        },
        "progress": {
            "task_a": {"numInputRows": 10},
            "task_b": {"numInputRows": 20},
        },
    }
    lines = prometheus_text(snap).strip().split("\n")
    current = None
    seen_families = []
    for ln in lines:
        if ln.startswith("# TYPE "):
            current = ln.split()[2]
            assert current not in seen_families, f"family {current} split"
            seen_families.append(current)
        else:
            name = ln.split("{")[0]
            assert name == current, f"sample {name} outside its family block"
    # both tasks present for each family
    text = prometheus_text(snap)
    assert text.count('consume_msgs_total{task=') == 2
    assert text.count('num_input_rows{task=') == 2
