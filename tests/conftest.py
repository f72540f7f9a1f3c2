"""Session fixtures.

Expected skips: exactly THREE tests in test_multimodal.py
``importorskip`` optional codec libraries this container doesn't ship
(PIL ×2, soundfile ×1). They are cross-checks that the stdlib-tier
decode/resize paths agree with the real libraries bit-for-bit where
those libraries exist; the stdlib paths themselves (pure-Python PNG,
``wave``-module WAV) are fully tested unconditionally in the same
file, so no production path loses coverage when the libs are absent.
Any skip count other than 3 (with PIL/soundfile absent) is a
regression — investigate, don't ignore."""

from __future__ import annotations

import os

import pytest

from flink_assignment_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fas-tests", cpus=8, shuffle_partitions=8)
    yield s
