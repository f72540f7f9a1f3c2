"""Local mirror of the driver's DuckDB-oracle compare.

Runs the Spark query and the oracle SQL side by side, sorts columns
by name, normalizes rows, and asserts exact equality (stricter than
the driver's hash — any drift fails here first).
"""

from __future__ import annotations

import math
import os

import duckdb

from flink_assignment_spark.schemas import ALL_TABLES


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duck_run(oracle_sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_sorted = sorted([tuple(_norm(r[i]) for i in s_idx) for r in s_rows], key=repr)
    d_sorted = sorted([tuple(_norm(r[i]) for i in d_idx) for r in d_rows], key=repr)
    assert len(s_sorted) == len(d_sorted), (
        f"row count differs: spark={len(s_sorted)} oracle={len(d_sorted)}\n"
        f"spark sample: {s_sorted[:3]}\noracle sample: {d_sorted[:3]}"
    )
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if sr != dr:
            ok = len(sr) == len(dr) and all(
                (
                    a == b
                    or (
                        isinstance(a, float)
                        and isinstance(b, float)
                        and abs(a - b) <= float_tol
                    )
                )
                for a, b in zip(sr, dr)
            )
            if not ok:
                mismatches.append((i, sr, dr))
    assert not mismatches, f"{len(mismatches)} row mismatches, first 5: {mismatches[:5]}"
    return len(s_sorted)
