"""Streaming exact deduplication (SURVEY §7.3 step 9).

The streaming counterpart of ``operators.dedup.exact_dedup``: emit
the FIRST event per key, drop later duplicates. Two state regimes:

- watermarked (``ts_col`` given): ``dropDuplicatesWithinWatermark``
  — a key's dedup state is evicted once the watermark passes its
  last-seen event time plus ``delay``. State is bounded by the
  duplicate-arrival horizon instead of the key cardinality, which is
  the only regime that survives an unbounded 100 TB-scale stream
  (near-dups of a crawl page arrive minutes apart, not months).
- unbounded (no ``ts_col``): plain ``dropDuplicates`` — exact
  forever-dedup, state grows with distinct keys; acceptable only for
  bounded replays/backfills.

The reference has no streaming dedup (its only dedup-ish operator is
CEP first-match pairing, ``FlinkAssignment.scala:332-347``); this is
part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """First-event-per-key streaming dedup (see module docstring)."""
    if ts_col is None:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def exact_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming document dedup by full-text equality: hash the text
    (same md5 key as the batch ``exact_dedup``) and keep each hash's
    first document. The emitted rows carry ``text_hash`` so a batch
    reconciliation can join streaming survivors against batch groups.
    """
    hashed = docs.withColumn("text_hash", F.md5(F.col(text_col)))
    return dedup_stream(hashed, ["text_hash"], ts_col, delay)
