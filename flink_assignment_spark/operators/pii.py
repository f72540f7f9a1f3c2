"""PII detection and redaction — the scrub pass a training-data
pipeline runs before text leaves the ingestion zone (the C4 / Dolma /
FineWeb pipelines all carry one; see Soldaini et al. 2024's Dolma
toolkit for the canonical open implementation).

This module EXTENDS the q59 gate (operators/gates.py::pii_stats —
email/URL counts + redacted-text hash) with the other Dolma scrub
categories (IPv4 addresses, phone-shaped digit runs), a typed-
placeholder FULL-TEXT redaction contract (the downstream pipeline
consumes the redacted text itself, not just its hash), and pinned
idempotence. The email pattern is imported from gates — one
definition, no drift.

Catalyst-only: detection is ``regexp_extract_all`` counts and
redaction is ordered ``regexp_replace`` passes, so the operator is a
STATELESS NARROW MAP — no shuffle, runs verbatim on a streaming frame,
and whole-stage codegen keeps it JVM-side (no Python in the hot
path). The patterns deliberately use only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, word boundaries; no lookaround, no backreferences
— so the DuckDB oracle matches byte-for-byte (q138's exact-hash
compare is the cross-engine contract test for the patterns
themselves).

Redaction ORDER is part of the contract: emails first (their local
parts can contain digit runs a later pass might clip), then IPv4
(dotted digit quads), then phones (digit-dash runs) — each pass sees
the previous pass's placeholders, never raw text it could re-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common-subset patterns (see module docstring);
# EMAIL_RE is shared with the q59 gate — one definition, no drift
from .gates import EMAIL_RE  # noqa: E402

IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def redact_pii(text: Column) -> Column:
    """``text`` with emails, IPv4 addresses, and phone-shaped digit
    runs replaced by typed placeholders, in the documented order."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TAG)
    out = F.regexp_replace(out, IPV4_RE, IPV4_TAG)
    return F.regexp_replace(out, PHONE_RE, PHONE_TAG)


def pii_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII audit + scrub: match counts per category
    (detected on the RAW text, before any redaction pass) and the
    fully redacted text. Returns
    (id, n_email, n_ipv4, n_phone, redacted)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("int").alias("n_email"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)).cast("int").alias("n_ipv4"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).cast("int").alias("n_phone"),
        redact_pii(text).alias("redacted"),
    )
