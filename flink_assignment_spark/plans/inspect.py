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


def udf_below_roundrobin(df_or_plan) -> int:
    """Count Python-eval nodes (ArrowEvalPython / BatchEvalPython)
    sitting in the SUBTREE BENEATH a round-robin Exchange — the q123
    hazard class: Catalyst pushes a deterministic Python-UDF predicate
    below a ``repartition(n)`` spread, so the whole gate executes on
    the UN-spread input (one task on a single small parquet split)
    while the exchange above it fans out rows that were already
    filtered. The fix is an optimizer fence (``asNondeterministic()``)
    or filtering on a materialized boolean column after the exchange;
    this checker is the regression tripwire that would have caught
    q123 before the bench did.

    Only the MAIN plan tree is walked (subqueries never contain a
    spread). MapInPandas/applyInPandas stages are intentionally NOT
    counted: kernels are SUPPOSED to sit above the spread, and a
    map-kernel below a later hash exchange is normal plan shape.
    """
    plan = df_or_plan if isinstance(df_or_plan, str) else physical_plan(df_or_plan)
    lines = plan.splitlines()
    tree: list[str] = []
    started = False
    for ln in lines:
        if ln.startswith("== Physical Plan =="):
            started = True
            continue
        if started:
            if not ln.strip():
                break
            tree.append(ln)
    node_re = re.compile(r"^([\s:+\-]*)(?:\* )?([A-Za-z][\w .]*?) \((\d+)\)\s*$")
    nodes: list[tuple[int, str]] = []  # (depth, name) in pre-order
    ids: list[int] = []
    for ln in tree:
        m = node_re.match(ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2).strip()))
            ids.append(int(m.group(3)))
    rr_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) Exchange\s*\n(?:[^\n]*\n)*?Arguments: ([^\n]*)", plan
        )
        if "RoundRobinPartitioning" in m.group(2)
    }
    bad = 0
    for i, ((depth, name), nid) in enumerate(zip(nodes, ids)):
        if name != "Exchange" or nid not in rr_ids:
            continue
        for d2, n2 in nodes[i + 1 :]:
            if d2 <= depth:
                break
            if n2 in ("ArrowEvalPython", "BatchEvalPython"):
                bad += 1
    return bad
