#!/usr/bin/env python
"""Reference-scale benchmark: Q1–Q9 over a large GitHub-commit JSONL
corpus, approximating the reference's own workload (306 MB
line-delimited JSON replayed through Flink at parallelism 1 —
reference ``FlinkAssignment.scala:32``, ``data/flink_commits.json``).

Generates (once, cached under .bench_cache/) ~SIZE_MB of synthetic
commits with the same shape as the test fixture, then times each
reference query end-to-end (JSON scan + parse included — that is the
reference's dominant cost too). Prints one JSON line.

Usage: python bench_reference.py [--mb 300] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def ensure_corpus(target_mb: int) -> tuple[str, str]:
    """Generate commits/geo JSONL of ~target_mb MB (cached)."""
    from tests.commit_fixtures import make_commits, make_geo

    cdir = os.path.join(CACHE, f"commits_{target_mb}mb")
    gpath = os.path.join(CACHE, f"geo_{target_mb}mb.jsonl")
    marker = os.path.join(cdir, "_DONE")
    if os.path.exists(marker) and os.path.exists(gpath):
        return cdir, gpath
    os.makedirs(cdir, exist_ok=True)
    written = 0
    target = target_mb * 1024 * 1024
    part = 0
    geo_f = open(gpath, "w")
    while written < target:
        commits = make_commits(n=20000, seed=1000 + part)
        geo = make_geo(commits, seed=2000 + part)
        path = os.path.join(cdir, f"part{part:04d}.jsonl")
        with open(path, "w") as f:
            for c in commits:
                # unique shas per part so the interval join stays sane
                c["sha"] = f"p{part}_{c['sha']}"
                line = json.dumps(c)
                f.write(line + "\n")
                written += len(line) + 1
        for g in geo:
            g["sha"] = f"p{part}_{g['sha']}"
            geo_f.write(json.dumps(g) + "\n")
        part += 1
    geo_f.close()
    open(marker, "w").write("ok")
    return cdir, gpath


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=int(os.environ.get("SPARK_GRAFT_REF_MB", "300")))
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    t_gen = time.monotonic()
    cdir, gpath = ensure_corpus(args.mb)
    gen_s = round(time.monotonic() - t_gen, 1)
    size_mb = round(
        sum(os.path.getsize(os.path.join(cdir, f)) for f in os.listdir(cdir)) / 1e6, 1
    )

    from flink_assignment_spark.queries import reference as R
    from flink_assignment_spark.session import get_spark
    from flink_assignment_spark.sources.loaders import read_commit_geo_json, read_commits_json

    spark = get_spark("fas-bench-reference", cpus=args.cpus)
    commits = read_commits_json(spark, cdir)
    geo = read_commit_geo_json(spark, gpath)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(R.dummy_question(commits))  # warm-up (JVM + JSON reader)

    queries = {
        "q1": lambda: R.question_one(commits),
        "q2": lambda: R.question_two(commits),
        "q3": lambda: R.question_three(commits),
        "q4": lambda: R.question_four(commits),
        "q5": lambda: R.question_five(commits),
        "q6": lambda: R.question_six(commits),
        "q7": lambda: R.question_seven(commits),
        "q8": lambda: R.question_eight(commits, geo),
        "q9": lambda: R.question_nine(commits),
    }
    timings = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        run(fn())
        timings[name] = round(time.monotonic() - t0, 2)
    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "metric": "reference-workload Q1-Q9 wall-clock (JSON scan incl.)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "corpus_mb": size_mb,
                "mb_per_sec_avg_query": round(size_mb / (total / len(timings)), 1),
                "corpus_gen_sec": gen_s,
            }
        )
    )


if __name__ == "__main__":
    main()
