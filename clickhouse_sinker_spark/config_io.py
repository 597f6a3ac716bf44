"""Reference-compatible config loading (C4 front door).

The reference reads hjson task files (docker/test_*.hjson; parsed by
hjson-go — config/config.go:241-256).  A user switching to this engine
brings those files unchanged: ``load_config`` parses the hjson-lite
dialect the reference ships (unquoted keys/strings, comments, optional
commas) and maps the camelCase key surface of the Go structs
(config/config.go:46-198) onto our dataclasses, including:

- ``clickhouse.hosts`` as a list of replica-lists → shard count = outer
  length, replicas flattened per shard (pool/conn.go topology);
- ``task`` (singular) or ``tasks`` (list);
- ``parser: json`` → fastjson-equivalent `from_json` path;
- ``DynamicSchema {Enable, MaxDims, WhiteList, BlackList}`` nesting;
- ``fields`` as an embedded JSON string (P5 constant injection);
- key lookup is case-insensitive because the reference's own examples mix
  spellings (``autoSchema`` vs ``PrometheusSchema``).

No code is shared with the reference; the parser below is a ~80-line
recursive-descent reader of the hjson subset those files use.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from .config import ClickHouseConfig, KafkaConfig, TaskConfig, normalize_tasks

__all__ = ["parse_hjson", "load_config", "SinkerConfig"]


class _P:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def _ws(self, newlines: bool = True) -> None:
        stop = " \t\r\n" if newlines else " \t\r"
        while self.i < len(self.t):
            c = self.t[self.i]
            if c in stop:
                self.i += 1
            elif c == "#" or self.t.startswith("//", self.i):
                while self.i < len(self.t) and self.t[self.i] != "\n":
                    self.i += 1
            elif self.t.startswith("/*", self.i):
                end = self.t.find("*/", self.i)
                self.i = len(self.t) if end < 0 else end + 2
            else:
                return

    def value(self):
        self._ws()
        c = self.t[self.i]
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        if c in "\"'":
            return self.qstr(c)
        return self.bare()

    def obj(self) -> dict:
        self.i += 1  # {
        out: dict = {}
        while True:
            self._ws()
            if self.t[self.i] == "}":
                self.i += 1
                return out
            if self.t[self.i] == ",":
                self.i += 1
                continue
            key = self.qstr(self.t[self.i]) if self.t[self.i] in "\"'" else self._bare_key()
            self._ws()
            assert self.t[self.i] == ":", f"expected ':' at {self.i}"
            self.i += 1
            out[key] = self.value()

    def arr(self) -> list:
        self.i += 1  # [
        out: list = []
        while True:
            self._ws()
            if self.t[self.i] == "]":
                self.i += 1
                return out
            if self.t[self.i] == ",":
                self.i += 1
                continue
            out.append(self.value())

    def qstr(self, q: str) -> str:
        end = self.i + 1
        while self.t[end] != q:
            end += 2 if self.t[end] == "\\" else 1
        s = self.t[self.i + 1 : end]
        self.i = end + 1
        return s.replace('\\"', '"').replace("\\\\", "\\")

    def _bare_key(self) -> str:
        end = self.i
        while self.t[end] not in ":\n":
            end += 1
        k = self.t[self.i : end].strip()
        self.i = end
        return k

    def bare(self):
        # hjson scalar rules: a number/bool/null terminated by , } ] or EOL
        # is typed; anything else is a quoteless string running to EOL
        # (regex values like ^(key_[0-9])$ contain ] and must not stop there)
        nl = self.t.find("\n", self.i)
        if nl < 0:
            nl = len(self.t)
        line = self.t[self.i : nl]
        m = re.match(
            r"\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|true|false|null)\s*(?=[,\}\]]|$)", line
        )
        if m:
            tok = m.group(1)
            self.i += m.end(1)
            if tok in ("true", "false"):
                return tok == "true"
            if tok == "null":
                return None
            try:
                return int(tok)
            except ValueError:
                return float(tok)
        # quoteless string; tolerate inline closers (`brokers: b:9092 }`,
        # `[ 10.0.0.1 ] ]`): a PURE trailing run of ] } , whitespace belongs
        # to the enclosing containers, not the string.  Regex values like
        # ^(key_[0-9]?)$ keep their brackets — their trailing run is broken
        # by non-closer characters.
        m2 = re.search(r"[\s]*[\]\},][\s,\]\}]*$", line)
        if m2 and m2.start() > 0:
            self.i += m2.start()
            return line[: m2.start()].strip()
        self.i = nl
        return line.strip()


def parse_hjson(text: str) -> dict:
    """Parse the hjson subset the reference's config files use."""
    try:
        return json.loads(text)  # plain JSON fast path
    except json.JSONDecodeError:
        return _P(text).value()


def _ci(d: dict, *names: str, default=None):
    """Case-insensitive multi-name lookup (the reference mixes spellings)."""
    low = {k.lower(): v for k, v in d.items()}
    for n in names:
        if n.lower() in low:
            return low[n.lower()]
    return default


@dataclass
class SinkerConfig:
    clickhouse: ClickHouseConfig
    kafka: KafkaConfig
    tasks: list[TaskConfig] = field(default_factory=list)


def _task_from_dict(d: dict) -> TaskConfig:
    parser = str(_ci(d, "parser", default="fastjson"))
    if parser == "json":
        parser = "fastjson"  # reference alias (config/config.go:446-452)
    dyn = _ci(d, "dynamicSchema", default={}) or {}
    dyn_enabled = bool(_ci(dyn, "enable", default=False)) if isinstance(dyn, dict) else bool(dyn)
    fields_raw = _ci(d, "fields", default="") or ""
    fields = json.loads(fields_raw) if isinstance(fields_raw, str) and fields_raw else (
        fields_raw if isinstance(fields_raw, dict) else {}
    )
    dims = tuple(
        (_ci(x, "name"), _ci(x, "type"), _ci(x, "sourceName", default=None))
        for x in (_ci(d, "dims", default=[]) or [])
    )
    return TaskConfig(
        name=_ci(d, "name", default="task"),
        topic=_ci(d, "topic", default="topic"),
        consumer_group=_ci(d, "consumerGroup", default="group"),
        earliest=bool(_ci(d, "earliest", default=True)),
        parser=parser,
        csv_format=tuple(_ci(d, "csvFormat", default=[]) or []),
        delimiter=_ci(d, "delimiter", default=",") or ",",
        table_name=_ci(d, "tableName", default="table"),
        series_table_name=_ci(d, "seriesTableName", default="") or "",
        auto_schema=bool(_ci(d, "autoSchema", default=False)),
        exclude_columns=tuple(_ci(d, "excludeColumns", default=[]) or []),
        dims=dims,
        dynamic_schema=dyn_enabled,
        max_dims=int(_ci(dyn, "maxDims", default=0) or 0) if isinstance(dyn, dict) else 0,
        white_list=_ci(dyn, "whiteList", default="") or "" if isinstance(dyn, dict) else "",
        black_list=_ci(dyn, "blackList", default="") or "" if isinstance(dyn, dict) else "",
        prometheus_schema=bool(_ci(d, "prometheusSchema", default=False)),
        sharding_key=_ci(d, "shardingKey", default="") or "",
        sharding_stripe=int(_ci(d, "shardingStripe", default=0) or 0),
        flush_interval=int(_ci(d, "flushInterval", default=10) or 10),
        buffer_size=int(_ci(d, "bufferSize", default=1 << 18) or (1 << 18)),
        time_unit=float(_ci(d, "timeUnit", default=1.0) or 1.0),
        timezone=_ci(d, "timeZone", default="UTC") or "UTC",
        fields=fields,
    )


def load_config(source: str | dict) -> SinkerConfig:
    """Text (hjson/json), file path, or dict → SinkerConfig with the
    reference's normalization chain applied."""
    if isinstance(source, str):
        if "\n" not in source and source.endswith((".json", ".hjson")):
            with open(source) as f:
                source = f.read()
        d = parse_hjson(source)
    else:
        d = source

    ch_d = _ci(d, "clickhouse", default={}) or {}
    hosts_nested = _ci(ch_d, "hosts", default=[["localhost"]]) or [["localhost"]]
    port = _ci(ch_d, "port", default=8123)
    # outer list = shards; inner = replicas (pool/conn.go topology).  Each
    # shard keeps its comma-separated replica list; the sink connects to
    # one replica at a time and fails over with version fencing (S5).
    hosts = tuple(
        ",".join(f"{h}:{port}" for h in (shard if isinstance(shard, list) else [shard]))
        for shard in hosts_nested
    )
    from .gosypt import unmarshal

    ch = ClickHouseConfig(
        hosts=hosts,
        database=_ci(ch_d, "db", "database", default="default"),
        username=_ci(ch_d, "username", default="default") or "default",
        password=_ci(ch_d, "password", default="") or "",
        shards=len(hosts),
        retry_times=int(_ci(ch_d, "retryTimes", default=3) or 0),
    )
    # C5: decrypt ENC(...) credentials at config-apply time, clickhouse
    # section only — matching applyConfig (task/sinker.go:345-349)
    ch = unmarshal(ch)
    k_d = _ci(d, "kafka", default={}) or {}
    known = {"brokers", "version"}
    security = {k: str(v) for k, v in k_d.items() if k.lower() not in known}
    kafka = KafkaConfig(brokers=_ci(k_d, "brokers", default="localhost:9092"), security=security)

    raw_tasks = _ci(d, "tasks", default=None)
    if raw_tasks is None:
        single = _ci(d, "task", default=None)
        raw_tasks = [single] if single else []
    tasks = normalize_tasks([_task_from_dict(t) for t in raw_tasks])
    return SinkerConfig(clickhouse=ch, kafka=kafka, tasks=tasks)
