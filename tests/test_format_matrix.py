"""Format matrix: documents and events round-trip value-exactly
through every supported batch format (parquet / orc / json / csv),
including timestamps under a non-UTC-hostile format contract."""

from __future__ import annotations

import pytest

from flink_assignment_spark.sources.loaders import load_table, read_format
from flink_assignment_spark.sources.sinks import write_format

from .conftest import SF_DIR

FORMATS = ["parquet", "orc", "json", "csv"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", FORMATS)
def test_documents_round_trip(spark, fmt, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    p = str(tmp_path / f"docs_{fmt}")
    write_format(docs, p, fmt)
    back = read_format(spark, p, fmt, schema=docs.schema)
    assert back.schema == docs.schema
    assert _rows(back) == _rows(docs)


@pytest.mark.parametrize("fmt", FORMATS)
def test_events_round_trip_with_timestamps(spark, fmt, tmp_path):
    """events carries microsecond timestamps and a JSON-bearing string
    column (commas + quotes — the CSV quoting torture case)."""
    ev = load_table(spark, SF_DIR, "events")
    p = str(tmp_path / f"ev_{fmt}")
    write_format(ev, p, fmt)
    back = read_format(spark, p, fmt, schema=ev.schema)
    assert _rows(back) == _rows(ev)


def test_unsupported_format_raises(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="unsupported format"):
        write_format(docs, "/tmp/x", "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_format(spark, "/tmp/x", "avro")
