"""Scalar column functions (SURVEY §2.7).

Every helper is a pure Catalyst expression (no Python UDFs): these
stay inside whole-stage codegen and cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_extension(filename: Column) -> Column:
    """Last '.'-separated segment of a filename.

    Mirrors ``name.split("\\.").lastOption`` (reference
    ``FlinkAssignment.scala:88``). Note Scala's ``split`` drops
    trailing empty strings, so "a." → ["a"] → "a"; Spark keeps them,
    so we filter empties and take the last non-empty segment.
    """
    parts = F.filter(F.split(filename, r"\."), lambda p: p != F.lit(""))
    # try_element_at: a dots-only filename ("...") yields an empty
    # array; plain element_at would throw under ANSI mode (Spark 4
    # default) — Scala's lastOption returns None, so null is correct
    return F.try_element_at(parts, F.lit(-1))


def strip_query_string(url: Column) -> Column:
    """``replaceAll("\\?.*$", "")`` (reference ``FlinkAssignment.scala:175,311``)."""
    return F.regexp_replace(url, r"\?.*$", "")


def repo_from_url(url: Column) -> Column:
    """Parse ``owner/repo`` from a GitHub API commit URL, with the
    reference's positional fallbacks for malformed URLs.

    Mirrors reference ``FlinkAssignment.scala:174-183`` (inlined again
    at ``:311-319``) exactly:

    1. strip the query string, split on ``/``;
    2. if a ``repos`` segment exists with ≥ 2 segments after it, take
       those two;
    3. else if the URL has ≥ 4 segments, take the 3rd- and 2nd-last
       (the owner/repo position in a web URL like
       ``https://host/owner/repo/commits``);
    4. else return the cleaned URL itself.

    Scala's ``split`` drops TRAILING empty segments (a trailing ``/``
    never yields one) but keeps interior ones (``https://`` yields an
    empty segment at index 1) — reproduced by stripping trailing
    slashes before Spark's ``split``, which otherwise keeps both.
    """
    cleaned = strip_query_string(url)
    parts = F.split(F.regexp_replace(cleaned, r"/+$", ""), "/")
    idx = F.array_position(parts, "repos")  # 1-based; 0 when absent
    n = F.size(parts)
    happy = F.concat(
        F.try_element_at(parts, (idx + 1).cast("int")),
        F.lit("/"),
        F.try_element_at(parts, (idx + 2).cast("int")),
    )
    positional = F.concat(
        F.try_element_at(parts, F.lit(-3)),
        F.lit("/"),
        F.try_element_at(parts, F.lit(-2)),
    )
    return (
        F.when((idx > 0) & (idx + 2 <= n), happy)
        .when(n >= 4, positional)
        .otherwise(cleaned)
    )


def day_str(ts: Column) -> Column:
    """``SimpleDateFormat("dd-MM-yyyy")`` of a window start (reference
    ``FlinkAssignment.scala:130-131, 201-202``), session TZ pinned UTC."""
    return F.date_format(ts, "dd-MM-yyyy")


def tumbling_start(ts: Column, width_seconds: int) -> Column:
    """Epoch-aligned tumbling-window START as a plain timestamp.

    Identical bucketing to ``F.window(ts, ...)`` (both are
    epoch-aligned, UTC) but grouped on ONE 8-byte timestamp instead of
    a (start, end) struct — in batch the struct key costs ~3× in the
    aggregate exchange (wider shuffle key, no codegen fast path).
    Batch queries group on this; streaming keeps ``F.window`` (the
    struct is what watermark eviction understands).
    """
    w = F.lit(width_seconds).cast("long")
    return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / w).cast("long") * w)


def sliding_starts(ts: Column, width_seconds: int, slide_seconds: int) -> Column:
    """Array of every epoch-aligned sliding-window start containing
    ``ts`` (width/slide windows each event belongs to) — explode this
    and group on the single-timestamp start (same rationale as
    :func:`tumbling_start`)."""
    n = width_seconds // slide_seconds
    s = F.lit(slide_seconds).cast("long")
    newest = F.floor(F.unix_timestamp(ts) / s).cast("long") * s
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.timestamp_seconds(newest - i.cast("long") * s),
    )


def utc_day(ts: Column) -> Column:
    """Calendar DATE of an instant in UTC, independent of
    ``spark.sql.session.timeZone`` (``to_date`` would shift buckets
    under a non-UTC driver session). Pure epoch arithmetic."""
    epoch_day = F.floor(F.unix_micros(ts) / F.lit(86400 * 1_000_000)).cast("int")
    return F.date_add(F.lit("1970-01-01").cast("date"), epoch_day)


def utc_week_start(ts: Column) -> Column:
    """Monday of the instant's UTC week as a DATE — the tz-stable twin
    of ``date_trunc('week', ts)``. Epoch day 0 (1970-01-01) was a
    Thursday, so Monday offset = (epoch_day + 3) mod 7."""
    epoch_day = F.floor(F.unix_micros(ts) / F.lit(86400 * 1_000_000)).cast("int")
    monday = (epoch_day - F.pmod(epoch_day + F.lit(3), F.lit(7))).cast("int")
    return F.date_add(F.lit("1970-01-01").cast("date"), monday)
