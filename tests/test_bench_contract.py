"""bench.py's driver-facing output contract: the compact final JSON
line must fit the harness's ~2 KB stdout tail window (BENCH_r05 went
unparseable when the full-name line outgrew it), and short keys must
stay collision-free over the real registry."""

from __future__ import annotations

import json

from bench import short_keys
from flink_assignment_spark.queries.synthetic import REGISTRY

TAIL_WINDOW_BYTES = 1900  # observed capture ≈ 2000; keep headroom


def test_compact_line_fits_tail_window():
    timings = {name: 123.456 for name in REGISTRY}
    line = json.dumps(
        {
            "value": 12345.678,
            "unit": "sec",
            "queries": short_keys(timings),
            "sf": 0.1,
            "reps_per_query": 2,
            "sent": {k: [123.45, 12.3] for k in ("q05", "q23", "q39", "q72", "q74")},
            "keys": "query number prefixes",
        },
        separators=(",", ":"),
    )
    assert len(line) < TAIL_WINDOW_BYTES, (
        f"compact bench line is {len(line)} bytes — the driver's tail "
        "capture will truncate it; shorten keys or drop fields"
    )


def test_short_keys_unique_and_values_rounded():
    names = list(REGISTRY)
    short = short_keys({n: 1.2345 for n in names})
    assert len(short) == len(names)
    assert all(v == 1.23 for v in short.values())
    # every key resolves back to at least one query by number prefix
    for key in short:
        base = key.rstrip("x")
        assert any(n.split("_", 1)[0] == base for n in names), key
