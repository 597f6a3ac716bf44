"""Registry-backed config publishing (reference: config_manager/nacos.go).

The fake server below implements the subset of the public Nacos v1 REST
API the client uses — config get/publish, ephemeral instance register/
deregister/beat/list — so the full manager stack (leader election, snake
assignment publish, freshness short-circuit, watch loop) is exercised over
real HTTP with stdlib only.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from clickhouse_sinker_spark.registry import (
    NacosClient,
    NacosConfManager,
    RegistryError,
)


class _FakeNacosHandler(BaseHTTPRequestHandler):
    server_version = "FakeNacos/1"

    def log_message(self, *a):  # quiet
        pass

    # -- helpers ----------------------------------------------------------

    def _params(self) -> dict:
        parsed = urllib.parse.urlparse(self.path)
        params = {k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()}
        length = int(self.headers.get("Content-Length") or 0)
        if length:
            body = self.rfile.read(length).decode()
            params.update({k: v[0] for k, v in urllib.parse.parse_qs(body).items()})
        return params

    def _reply(self, text: str, code: int = 200):
        data = text.encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _route(self, method: str):
        st = self.server.state
        path = urllib.parse.urlparse(self.path).path
        p = self._params()
        if path == "/nacos/v1/auth/login" and method == "POST":
            st["logins"] += 1
            return self._reply(json.dumps({"accessToken": "tok-123", "tokenTtl": 18000}))
        if path == "/nacos/v1/cs/configs":
            key = (p.get("dataId"), p.get("group"))
            if method == "GET":
                if key not in st["configs"]:
                    return self._reply("config data not exist", 404)
                return self._reply(st["configs"][key])
            if method == "POST":
                st["configs"][key] = p["content"]
                return self._reply("true")
            if method == "DELETE":
                st["configs"].pop(key, None)
                return self._reply("true")
        if path == "/nacos/v1/ns/instance":
            key = (p.get("serviceName"), p.get("groupName"))
            inst = (p.get("ip"), int(p.get("port", 0)))
            if method == "POST":
                st["instances"].setdefault(key, {})[inst] = time.monotonic()
                return self._reply("ok")
            if method == "DELETE":
                st["instances"].get(key, {}).pop(inst, None)
                return self._reply("ok")
        if path == "/nacos/v1/ns/instance/beat" and method == "PUT":
            beat = json.loads(p["beat"])
            key = (p.get("serviceName"), p.get("groupName"))
            inst = (beat["ip"], int(beat["port"]))
            st["beats"] += 1
            st["instances"].setdefault(key, {})[inst] = time.monotonic()
            return self._reply(json.dumps({"clientBeatInterval": 5000}))
        if path == "/nacos/v1/ns/instance/list" and method == "GET":
            key = (p.get("serviceName"), p.get("groupName"))
            hosts = [
                {"ip": ip, "port": port, "healthy": True, "enabled": True}
                for (ip, port) in st["instances"].get(key, {})
            ]
            return self._reply(json.dumps({"hosts": hosts}))
        return self._reply("not found", 404)

    def do_GET(self):
        self._route("GET")

    def do_POST(self):
        self._route("POST")

    def do_PUT(self):
        self._route("PUT")

    def do_DELETE(self):
        self._route("DELETE")


@pytest.fixture()
def nacos():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeNacosHandler)
    server.state = {"configs": {}, "instances": {}, "beats": 0, "logins": 0}
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server
    finally:
        server.shutdown()
        server.server_close()


def _addr(server) -> str:
    return f"127.0.0.1:{server.server_address[1]}"


CONF = {
    "clickhouse": {"hosts": [["ck1"]], "port": 9000},
    "kafka": {"brokers": "k:9092"},
    "tasks": [{"name": f"t{i}", "topic": f"topic{i}"} for i in range(5)],
}


def _manager(server, ip: str, port: int, **kw) -> NacosConfManager:
    m = NacosConfManager(**kw)
    m.init(
        {
            "serverAddrs": _addr(server),
            "username": "nacos",
            "password": "nacos",
            "group": "sinker",
            "dataId": "sinker.hjson",
            "serviceName": "clickhouse_sinker",
        }
    )
    m.register(ip, port)
    return m


def test_client_config_roundtrip_and_login(nacos):
    c = NacosClient(_addr(nacos), username="nacos", password="nacos")
    c.login()
    assert nacos.state["logins"] == 1
    assert c.get_config("d", "g") is None
    c.publish_config("d", "g", "{a: 1}")
    assert c.get_config("d", "g") == "{a: 1}"


def test_client_instance_lifecycle(nacos):
    c = NacosClient(_addr(nacos))
    c.register_instance("10.0.0.2", 2112, "svc", "g")
    c.register_instance("10.0.0.1", 2112, "svc", "g")
    assert c.list_instances("svc", "g") == ["10.0.0.1:2112", "10.0.0.2:2112"]
    c.beat("10.0.0.1", 2112, "svc", "g")
    c.deregister_instance("10.0.0.2", 2112, "svc", "g")
    assert c.list_instances("svc", "g") == ["10.0.0.1:2112"]


def test_client_failover_to_second_server(nacos):
    # first server address refuses connections; the client falls through
    c = NacosClient(["127.0.0.1:1", _addr(nacos)], timeout=0.5)
    c.publish_config("d", "g", "x")
    assert c.get_config("d", "g") == "x"
    bad = NacosClient(["127.0.0.1:1"], timeout=0.3)
    with pytest.raises(RegistryError):
        bad.publish_config("d", "g", "x")


def test_leader_publishes_assignment_snake(nacos):
    m1 = _manager(nacos, "10.0.0.1", 2112)  # lexicographically first → leader
    m2 = _manager(nacos, "10.0.0.2", 2112)
    m1.publish_config(CONF)

    assert m2.assign_once() is None  # not the scheduler (nacos.go:329-332)
    out = m1.assign_once()
    assert out is not None
    asg = out["assignment"]
    assert asg["version"] == 1
    assert asg["updatedBy"] == "10.0.0.1:2112"
    # snake over sorted instances: t0,t3,t4 / t1,t2 (idx%2 fwd, then reversed)
    assert asg["map"] == {
        "10.0.0.1:2112": ["t0", "t3", "t4"],
        "10.0.0.2:2112": ["t1", "t2"],
    }
    # the non-leader reads its share back from the registry
    assert m2.assigned_tasks() == ["t1", "t2"]


def test_assignment_freshness_short_circuit(nacos):
    now = [1000.0]
    m = _manager(nacos, "10.0.0.1", 2112, clock=lambda: now[0])
    m.publish_config(CONF)
    assert m.assign_once()["assignment"]["version"] == 1
    # nothing changed, published by me 1 s ago → skip (nacos.go:339-346)
    now[0] += 1.0
    assert m.assign_once() is None
    # 11 minutes later the freshness window has lapsed → republish
    now[0] += 660.0
    assert m.assign_once()["assignment"]["version"] == 2


def test_task_change_triggers_reassign(nacos):
    m = _manager(nacos, "10.0.0.1", 2112)
    m.publish_config(CONF)
    assert m.assign_once()["assignment"]["version"] == 1
    conf2 = dict(CONF, tasks=CONF["tasks"] + [{"name": "t5", "topic": "x"}])
    m.publish_config(conf2)
    out = m.assign_once()
    assert out["assignment"]["version"] == 2
    assert "t5" in out["assignment"]["map"]["10.0.0.1:2112"]


def test_instance_change_triggers_reassign(nacos):
    m1 = _manager(nacos, "10.0.0.1", 2112)
    m1.publish_config(CONF)
    assert m1.assign_once()["assignment"]["version"] == 1
    _manager(nacos, "10.0.0.2", 2112)  # new instance joins
    out = m1.assign_once()
    assert out["assignment"]["version"] == 2
    assert set(out["assignment"]["map"]) == {"10.0.0.1:2112", "10.0.0.2:2112"}


def test_lag_aware_assignment(nacos):
    lags = {"t0": 100, "t1": 90, "t2": 10, "t3": 5, "t4": 5}
    conf = dict(CONF, kafka={"brokers": "k:9092", "rebalanceByLags": True})
    m1 = _manager(nacos, "10.0.0.1", 2112, lag_provider=lambda c: lags)
    _manager(nacos, "10.0.0.2", 2112)
    m1.publish_config(conf)
    asg = m1.assign_once()["assignment"]
    loads = {
        inst: sum(lags[t] for t in tasks) for inst, tasks in asg["map"].items()
    }
    # lag-sorted snake + greedy rebalance keeps the two loads close
    assert abs(loads["10.0.0.1:2112"] - loads["10.0.0.2:2112"]) <= 20
    assert sorted(t for ts in asg["map"].values() for t in ts) == sorted(lags)


def test_run_loop_beats_and_reacts_to_config_change(nacos):
    m = _manager(nacos, "10.0.0.1", 2112)
    m.publish_config(CONF)
    m.run(poll_interval=0.05)
    try:
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline:
            cfg = m.client.get_config("sinker.hjson", "sinker")
            if cfg and "assignment" in json.loads(cfg):
                break
            time.sleep(0.05)
        asg = json.loads(m.client.get_config("sinker.hjson", "sinker"))["assignment"]
        assert asg["version"] == 1
        # config change (new task) → the loop publishes version 2
        conf2 = dict(CONF, tasks=CONF["tasks"] + [{"name": "t9", "topic": "x"}])
        m.publish_config(conf2)
        deadline = time.monotonic() + 5
        ver = 0
        while time.monotonic() < deadline:
            doc = json.loads(m.client.get_config("sinker.hjson", "sinker"))
            ver = (doc.get("assignment") or {}).get("version", 0)
            if ver >= 2:
                break
            time.sleep(0.05)
        assert ver >= 2
        assert nacos.state["beats"] > 0
    finally:
        m.stop()
    m.deregister("10.0.0.1", 2112)
    assert m.client.list_instances("clickhouse_sinker", "sinker") == []
