"""Physical-plan inspection helpers.

The scale contract ("would this plan survive 100 TB?") is enforced in
tests, not prose: filters must reach the parquet scan
(``PushedFilters``), projections must prune columns (``ReadSchema``),
dimension joins must broadcast, and shuffle counts must match the
operator's minimum. These helpers extract those facts from
``df.explain`` output so tests can assert on them.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_read_schema(df: DataFrame, table_substr: str) -> str:
    """ReadSchema of the scan whose location mentions ``table_substr``."""
    plan = physical_plan(df)
    for scan in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
        if table_substr in scan:
            m = re.search(r"ReadSchema: (struct<[^\n]*)", scan)
            if m:
                return m.group(1)
    return ""


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)
