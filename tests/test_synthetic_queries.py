"""Every driver-facing query hash-matches its DuckDB oracle at
sf0.001 (fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from flink_assignment_spark.queries.synthetic import REGISTRY

from .conftest import SF_DIR
from .oracle_harness import compare

ORACLE_QUERIES = [name for name, spec in REGISTRY.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    n = compare(spec.spark(spark, SF_DIR), spec.oracle, SF_DIR)
    # every query should produce SOMETHING at sf0.001 (empty results
    # would make the oracle check vacuous) — known-empty ones excepted
    if name not in ():
        assert n > 0, f"{name} returned 0 rows — vacuous oracle check"
