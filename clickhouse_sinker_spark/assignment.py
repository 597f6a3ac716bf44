"""Task assignment across sinker instances (R7 ≙ the reference's Nacos
scheduler, config_manager/nacos.go:312-466 + lag calc lags.go:29-114).

Under Spark the *scheduler* part of R7 is obsolete — the cluster manager
distributes partitions — but the ASSIGNMENT ALGORITHM still matters when a
deployment runs many independent pipelines (streaming queries) across
several driver instances: which instance should own which task.  This
module re-expresses that algorithm as pure deterministic functions, with
consumer lag taken from Structured Streaming progress events instead of a
Kafka admin client.

Semantics mirrored from the reference:

- the lexicographically-first instance is the scheduler (nacos.go:325-332);
- plain mode: tasks distributed "snake-wise" over sorted instances —
  forward on even passes, reversed on odd (nacos.go:433-444);
- lag mode (``RebalanceByLags``): tasks sorted by (lag desc, name asc)
  first, snake-distributed, then greedily rebalanced — repeatedly move one
  task from the most-loaded to the least-loaded instance whenever that
  strictly shrinks the load gap (|diff - 2·lag| < |diff|, nacos.go:391-420);
- every instance appears in the result (possibly with no tasks); every
  task appears exactly once; per-instance task lists are name-sorted for a
  stable publish payload (nacos.go:447-456).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

__all__ = [
    "scheduler_instance",
    "snake_assign",
    "assign_tasks",
    "task_lags_from_progress",
]


def scheduler_instance(instances: Sequence[str]) -> str | None:
    """The instance entitled to publish assignments: lexicographically
    first (the reference's 'only the first instance is capable to
    assign')."""
    return min(instances) if instances else None


def snake_assign(tasks: Sequence[str], instances: Sequence[str]) -> dict[str, list[str]]:
    """Distribute ``tasks`` (in the given order) over sorted ``instances``
    snake-wise: pass 0 goes 0,1,…,n-1; pass 1 goes n-1,…,1,0; and so on —
    so early (heavy) tasks don't always pile onto instance 0."""
    insts = sorted(instances)
    out: dict[str, list[str]] = {i: [] for i in insts}
    n = len(insts)
    for idx, name in enumerate(tasks):
        pos = idx % n
        if (idx // n) % 2 == 1:
            pos = n - 1 - pos
        out[insts[pos]].append(name)
    return out


def assign_tasks(
    tasks: Sequence[str],
    instances: Sequence[str],
    lags: Mapping[str, int] | None = None,
) -> dict[str, list[str]]:
    """Full assignment: snake distribution, optionally lag-sorted and
    greedily rebalanced.  Deterministic in its inputs; task lists in the
    result are name-sorted.  ``lags`` missing a task ⇒ that task counts
    as lag 0 (the reference defaults unknown state to 0)."""
    insts = sorted(instances)
    if not insts:
        return {}
    if lags is None:
        assigned = snake_assign(list(tasks), insts)
        return {i: sorted(ts) for i, ts in assigned.items()}

    lag_of = {t: int(lags.get(t, 0)) for t in tasks}
    ordered = sorted(tasks, key=lambda t: (-lag_of[t], t))
    assigned = snake_assign(ordered, insts)

    # greedy gap-shrinking rebalance (only meaningful with spare tasks)
    if len(insts) >= 2 and len(ordered) > len(insts):
        loads = {i: sum(lag_of[t] for t in ts) for i, ts in assigned.items()}
        while True:
            # most-loaded first; ties by instance name for determinism
            ranked = sorted(assigned, key=lambda i: (-loads[i], i))
            top, bottom = ranked[0], ranked[-1]
            diff = loads[top] - loads[bottom]
            if diff <= 0:
                break
            moved = False
            # top's list is kept lag-desc ordered; move the first task
            # whose transfer strictly shrinks the gap
            for t in assigned[top]:
                if abs(diff - 2 * lag_of[t]) < diff:
                    assigned[top].remove(t)
                    assigned[bottom].append(t)
                    assigned[bottom].sort(key=lambda x: (-lag_of[x], x))
                    loads[top] -= lag_of[t]
                    loads[bottom] += lag_of[t]
                    moved = True
                    break
            if not moved:
                break
    return {i: sorted(ts) for i, ts in assigned.items()}


def task_lags_from_progress(progress: Mapping[str, Mapping]) -> dict[str, int]:
    """Consumer lag per task from Structured Streaming progress events
    (``query.lastProgress``) — the Spark-native replacement for the
    reference's Kafka admin-client lag scan (lags.go:29-114).

    For each task's most recent progress, lag = Σ over sources and
    partitions of ``latestOffset - endOffset`` (what the engine has NOT
    yet processed).  Kafka sources report those as per-topic
    ``{topic: {partition: offset}}`` maps; file/rate sources (tests) may
    report plain ints.  Missing fields count as 0 — never negative."""
    out: dict[str, int] = {}
    for task, p in progress.items():
        total = 0
        for src in (p or {}).get("sources", []):
            latest, end = src.get("latestOffset"), src.get("endOffset")
            total += max(_offset_sum(latest) - _offset_sum(end), 0)
        out[task] = total
    return out


def _offset_sum(off) -> int:
    """Sum all partition offsets in a Kafka offset map (possibly a JSON
    string), or take a plain numeric offset as-is."""
    if off is None:
        return 0
    if isinstance(off, (int, float)):
        return int(off)
    if isinstance(off, str):
        import json

        try:
            return _offset_sum(json.loads(off))
        except ValueError:
            return 0
    if isinstance(off, Mapping):
        return sum(_offset_sum(v) for v in off.values())
    return 0
