"""Micro-bench: row-wise encode_block vs Arrow-columnar encode_block_arrow
on a sink-shaped frame (ids, floats, strings, epoch-µs timestamps).
Prints one JSON line with both wall times and the speedup ratio —
evidence for the NativeHttpSink mapInArrow framing path."""

from __future__ import annotations

import json
import time

import numpy as np
import pyarrow as pa

import sys

sys.path.insert(0, "/root/repo")

from clickhouse_sinker_spark.chproto import encode_block, encode_block_arrow


def main(n: int = 500_000) -> None:
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 2**62, n)
    vals = rng.uniform(-1e6, 1e6, n)
    flags = rng.integers(0, 2, n)
    ts = rng.integers(1_500_000_000_000_000, 1_700_000_000_000_000, n)
    strs = np.array([f"name_{i % 977}" for i in range(n)])
    fields = [
        ("id", "Int64"),
        ("v", "Float64"),
        ("flag", "UInt8"),
        ("ts", "DateTime64(6)"),
        ("name", "String"),
    ]
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(vals, pa.float64()),
            pa.array(flags, pa.int8()),
            pa.array(ts, pa.int64()),
            pa.array(strs),
        ],
        names=[f[0] for f in fields],
    )
    # the replaced sink path started from an iterator of ROW tuples
    # (foreachPartition) and transposed into per-column lists before
    # framing — that transpose is part of what the Arrow path eliminates
    rows = list(zip(*[batch.column(i).to_pylist() for i in range(len(fields))]))

    def rowwise() -> bytes:
        cols = [
            (name, t, [r[i] for r in rows]) for i, (name, t) in enumerate(fields)
        ]
        return encode_block(cols)

    t_row = min(
        (lambda t0=time.perf_counter(): (rowwise(), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    a = rowwise()

    t_arrow = min(
        (
            lambda t0=time.perf_counter(): (
                encode_block_arrow(fields, batch),
                time.perf_counter() - t0,
            )[1]
        )()
        for _ in range(3)
    )
    b = encode_block_arrow(fields, batch)

    assert a == b, "Arrow framing must be byte-identical to the row-wise path"
    print(
        json.dumps(
            {
                "rows": n,
                "rowwise_s": round(t_row, 3),
                "arrow_s": round(t_arrow, 3),
                "speedup": round(t_row / t_arrow, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
