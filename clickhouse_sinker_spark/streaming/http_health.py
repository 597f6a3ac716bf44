"""HTTP health/metrics endpoints + Prometheus pushgateway pusher — the
transport half of C6 (reference: cmd/clickhouse_sinker/main.go:163-237 for
the ``/`` ``/state`` ``/ready`` ``/live`` ``/metrics`` mux;
statistics/statistics.go:33-136 for the metric names — all prefixed
``clickhouse_sinker_`` — and :160-250 for the pushgateway loop with
address rotation on failure and delete-on-stop).

Spark-first: the numbers come from ``metrics.CounterListener`` (observe
counters piggybacking on the streaming plan + engine progress events);
this module only renders and serves them.  Stdlib http.server/urllib —
no Prometheus client dependency."""

from __future__ import annotations

import json
import threading
import urllib.parse
import urllib.request
from collections.abc import Callable, Mapping
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["prometheus_text", "HealthServer", "MetricsPusher"]

_PREFIX = "clickhouse_sinker_"  # statistics/statistics.go:33


def _san(v) -> str:
    return "NaN" if v is None else repr(float(v))


def prometheus_text(snapshot: Mapping) -> str:
    """Render a ``CounterListener.snapshot()`` in the Prometheus text
    exposition format, metric names matching the reference's
    (``clickhouse_sinker_consume_msgs_total`` etc., labeled by task).

    The exposition format requires every line of a metric family to form
    one contiguous group after its ``# TYPE`` line, so samples are pivoted
    metric-first (a task-first loop would interleave families and strict
    parsers reject the payload)."""
    out: list[str] = []
    # metric → [(task, value)], grouped so each family is contiguous
    counters_by_name: dict[str, list[tuple[str, object]]] = {}
    for task, counters in sorted(snapshot.get("totals", {}).items()):
        for name, value in counters.items():
            counters_by_name.setdefault(name, []).append((task, value))
    for name in sorted(counters_by_name):
        out.append(f"# TYPE {_PREFIX}{name} counter")
        for task, value in counters_by_name[name]:
            out.append(f'{_PREFIX}{name}{{task="{task}"}} {_san(value)}')
    gauge_map = {
        "numInputRows": "num_input_rows",
        "inputRowsPerSecond": "input_rows_per_second",
        "processedRowsPerSecond": "processed_rows_per_second",
    }
    gauges_by_name: dict[str, list[tuple[str, object]]] = {}
    for task, prog in sorted(snapshot.get("progress", {}).items()):
        for src, name in gauge_map.items():
            if src in prog:
                gauges_by_name.setdefault(name, []).append((task, prog[src]))
    for name in sorted(gauges_by_name):
        out.append(f"# TYPE {_PREFIX}{name} gauge")
        for task, value in gauges_by_name[name]:
            out.append(f'{_PREFIX}{name}{{task="{task}"}} {_san(value)}')
    return "\n".join(out) + "\n"


class HealthServer:
    """``/`` index, ``/metrics``, ``/state``, ``/ready[?full=1]``,
    ``/live[?full=1]`` (mux parity with cmd/clickhouse_sinker/main.go).

    ``state_fn`` returns {task: {"state": "RUN"|"DEAD", "lag": int}} —
    wire it to ``SinkerApp`` queries + ``task_lags_from_progress``; ready
    means every task reports RUN (no tasks ⇒ ready, matching a sinker
    with an empty assignment)."""

    def __init__(
        self,
        snapshot_fn: Callable[[], Mapping],
        state_fn: Callable[[], Mapping] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self._snapshot_fn = snapshot_fn
        self._state_fn = state_fn or (lambda: {})
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, body: str, code: int = 200, ctype: str = "text/plain"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                full = "full" in urllib.parse.parse_qs(parsed.query)
                if parsed.path == "/":
                    return self._reply(
                        "<html><head><title>clickhouse_sinker</title></head><body>"
                        '<p><a href="/state">State</a></p>'
                        '<p><a href="/metrics">Metrics</a></p>'
                        '<p><a href="/ready">Ready</a></p>'
                        '<p><a href="/live">Live</a></p>'
                        "</body></html>",
                        ctype="text/html",
                    )
                if parsed.path == "/metrics":
                    return self._reply(prometheus_text(outer._snapshot_fn()))
                if parsed.path == "/state":
                    return self._reply(
                        json.dumps(outer._state_fn()), ctype="application/json"
                    )
                if parsed.path in ("/ready", "/live"):
                    state = outer._state_fn()
                    # live = the process answers; ready = every task RUN
                    ok = parsed.path == "/live" or all(
                        t.get("state") == "RUN" for t in state.values()
                    )
                    body = (
                        json.dumps({"status": "ok" if ok else "fail", "tasks": state})
                        if full
                        else json.dumps({"status": "ok" if ok else "fail"})
                    )
                    return self._reply(body, 200 if ok else 503, "application/json")
                return self._reply("not found", 404)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class MetricsPusher:
    """Pushgateway loop (statistics/statistics.go:168-250): PUT the text
    exposition to ``<addr>/metrics/job/clickhouse_sinker/instance/<i>``
    every ``interval`` seconds; rotate to the next address on failure
    (reconnect parity); DELETE the metric group on stop so the gateway
    doesn't serve stale series forever."""

    JOB = "clickhouse_sinker"

    def __init__(
        self,
        addrs: list[str],
        interval: float,
        instance: str,
        source: Callable[[], str],
        timeout: float = 5.0,
    ):
        if not addrs or interval <= 0:
            raise ValueError("pushgateway addrs and a positive interval required")
        self.addrs = [a if "://" in a else f"http://{a}" for a in addrs]
        self.interval = interval
        self.instance = instance
        self.source = source
        self.timeout = timeout
        self._in_use = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _url(self) -> str:
        inst = urllib.parse.quote(self.instance, safe="")
        return f"{self.addrs[self._in_use]}/metrics/job/{self.JOB}/instance/{inst}"

    def push_once(self) -> bool:
        """One push; on failure rotate to the next gateway address."""
        req = urllib.request.Request(
            self._url(), data=self.source().encode(), method="PUT"
        )
        req.add_header("Content-Type", "text/plain")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                return True
        except OSError:
            self._in_use = (self._in_use + 1) % len(self.addrs)  # reconnect
            return False

    def start(self) -> None:
        def loop():
            while not self._stop.wait(self.interval):
                self.push_once()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        req = urllib.request.Request(self._url(), method="DELETE")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                pass
        except OSError:
            pass  # best-effort, mirrors the reference's logged-only failure
