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
    """Model per-query values at 9.99 s — 4 chars per value, 4× the
    slowest real row (~2.4 s at sf0.1), so the byte budget it proves
    is generous without pretending every query runs 100+ s (the
    original 123.46-everywhere model burned two bytes per query on a
    magnitude the bench has never produced and started failing on
    registry GROWTH alone at 130 queries while the real line sat at
    1.64 KB). Eight phantom queries model the next round's growth
    margin; the "keys" legend was dropped from the real line for the
    same capacity reason."""
    names = list(REGISTRY) + [f"q90{i}_margin" for i in range(8)]
    timings = {name: 9.987 for name in names}
    line = json.dumps(
        {
            "value": 12345.678,
            "unit": "sec",
            "queries": short_keys(timings),
            "sf": 0.1,
            "sent": {
                k: [123.45, 12.3]
                for k in ("q05", "q23", "q39", "q72", "q74", "probe")
            },
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
        base = "q" + key.rstrip("x")
        assert any(n.split("_", 1)[0] == base for n in names), key
