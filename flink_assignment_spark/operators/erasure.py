"""Erasure propagation (GDPR right-to-be-forgotten) — the delete
cascade a lakehouse runs when a user requests removal: the subject's
rows go, and so does everything reachable from them through foreign
keys (orders placed by an erased customer, line items of those
orders).

Plan shape at 100 TB: the tombstone set is tiny by nature (delete
requests, not data) — it BROADCASTS; each cascaded table is one
broadcast anti-join (subject keys) or one semi-join chain (child
tables through their parent's surviving keys). No shuffle is needed
on the subject side at all; children shuffle only if their parent key
join does (orders→lineitem is a plain equi-join Catalyst plans as
broadcast here and SMJ at scale). The streaming complement
(streaming/erasure_stream.py) folds tombstones as they arrive, gates
new records, and retro-purges bucket-partitioned state tables by
rewriting only the buckets a tombstone hashes into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def erase_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    tombstones: DataFrame,
) -> dict[str, DataFrame]:
    """The surviving (kept) side of the cascade: customers not in the
    tombstone set, orders of surviving customers, line items of
    surviving orders. ``tombstones`` is a one-column (c_custkey)
    frame; returns {"customer": ..., "orders": ..., "lineitem": ...}.
    """
    tomb = F.broadcast(tombstones.select("c_custkey").distinct())
    kept_cust = customer.join(tomb, "c_custkey", "left_anti")
    kept_orders = orders.join(
        tomb.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_anti"
    )
    kept_li = lineitem.join(
        kept_orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    return {"customer": kept_cust, "orders": kept_orders, "lineitem": kept_li}


def erasure_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    tombstones: DataFrame,
) -> DataFrame:
    """Audit row per cascaded table: (table_name, n_rows, n_purged,
    n_kept) — the evidence an erasure job files (row counts must
    reconcile exactly; a purge that loses or spares rows is a
    compliance bug, not a perf bug). Fully declarative: one broadcast
    left-join + one aggregate per table, no driver-side counting —
    the three single-row aggregates union into the report frame."""
    tomb = F.broadcast(
        tombstones.select("c_custkey").distinct().withColumn("__t", F.lit(1))
    )

    def audit(df: DataFrame, name: str) -> DataFrame:
        a = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_purged"),
        )
        return a.select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "n_purged",
            (F.col("n_rows") - F.col("n_purged")).cast("long").alias("n_kept"),
        )

    cust = customer.join(tomb, "c_custkey", "left")
    ords = orders.join(
        tomb.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left"
    )
    # a line item is purged iff its ORDER is: carry the order's flag
    li = lineitem.join(
        ords.select(F.col("o_orderkey").alias("l_orderkey"), "__t"),
        "l_orderkey",
        "left",
    )
    return (
        audit(cust, "customer")
        .unionByName(audit(ords, "orders"))
        .unionByName(audit(li, "lineitem"))
    )
