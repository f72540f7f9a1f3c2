#!/usr/bin/env python
"""Refresh tools/query_source_hashes.json — the per-query source-hash
snapshot the rotation uses to force changed-code queries into the
driver's correctness window (queries/_ledger.py::changed_queries).

The refresh is now AUTOMATIC: queries/_ledger.py::
refresh_snapshot_if_new_round rewrites the snapshot on the first
registry import after a new CORRECTNESS round lands. This tool remains
as the manual seed/override (e.g. to re-record from a clean historical
tree via a git worktree when edits preceded the first import).
Run BEFORE editing: the latest CORRECTNESS_r{N}.json
was produced against the committed tree as it stands, so hashing the
current tree records exactly the implementation each green row tested.
Each entry keeps {round: last driver-green round, hash: implementation
hash at that round}; queries that have never gone driver-green are
recorded with round=null so a later green rotates them in normally.

Usage: python tools/update_query_hashes.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=None,
        help="snapshot path (default: tools/query_source_hashes.json next to this script)",
    )
    args = ap.parse_args()

    from flink_assignment_spark.queries._ledger import (
        SNAPSHOT_PATH,
        derive_last_green,
        query_source_hash,
    )
    from flink_assignment_spark.queries.synthetic import REGISTRY

    last_green = derive_last_green()
    snap = {}
    for name, spec in REGISTRY.items():
        snap[name] = {
            "round": last_green.get(name),
            "hash": query_source_hash(spec.spark, spec.oracle),
        }
    out = args.out or SNAPSHOT_PATH
    with open(out, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
        f.write("\n")
    greens = sum(1 for v in snap.values() if v["round"] is not None)
    print(f"wrote {len(snap)} hashes ({greens} with a green round) to {out}")


if __name__ == "__main__":
    main()
