"""Golden tests for the nine reference queries (commit schema).

Mirrors the reference's autograder contract (SURVEY §5): run each
query over a deterministic commit corpus and compare against an
INDEPENDENT pure-Python implementation of the reference semantics
(`/root/reference/src/main/scala/FlinkAssignment.scala`). Results are
compared as multisets (streaming emission order is not part of the
contract).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import datetime, timedelta, timezone

import pytest

from flink_assignment_spark.queries import reference as R
from flink_assignment_spark.sources.loaders import read_commit_geo_json, read_commits_json

from .commit_fixtures import make_commits, make_geo, write_jsonl


def _ts(iso: str) -> datetime:
    return datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)


def _epoch_s(iso: str) -> int:
    return int(_ts(iso).timestamp())


def _day_str(epoch_s: int) -> str:
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).strftime("%d-%m-%Y")


def _fmt(epoch_s: int) -> str:
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def _ext(name: str) -> str | None:
    parts = [p for p in name.split(".") if p != ""]
    return parts[-1] if parts else None


def _repo(url: str) -> str:
    import re

    url = re.sub(r"\?.*$", "", url)
    m = re.search(r"/repos/([^/]+/[^/]+)", url)
    return m.group(1) if m else ""


@pytest.fixture(scope="session")
def corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("commits")
    commits = make_commits()
    geo = make_geo(commits)
    cpath, gpath = str(d / "commits.jsonl"), str(d / "geo.jsonl")
    write_jsonl(commits, cpath)
    write_jsonl(geo, gpath)
    return commits, geo, cpath, gpath


@pytest.fixture(scope="session")
def frames(spark, corpora):
    _, _, cpath, gpath = corpora
    return read_commits_json(spark, cpath), read_commit_geo_json(spark, gpath)


def test_dummy(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = Counter(r.sha for r in R.dummy_question(cdf).collect())
    assert got == Counter(c["sha"] for c in commits)


def test_q1(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = Counter(r.sha for r in R.question_one(cdf).collect())
    want = Counter(
        c["sha"] for c in commits if c["stats"] is not None and c["stats"]["additions"] >= 20
    )
    assert got == want


def test_q2(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = Counter(r.filename for r in R.question_two(cdf).collect())
    want = Counter(
        f["filename"]
        for c in commits
        for f in c["files"]
        if f["deletions"] > 30 and f["filename"] is not None
    )
    assert got == want


def _java_scala(commits):
    for c in commits:
        for f in c["files"]:
            if f["filename"] is None:
                continue
            e = _ext(f["filename"])
            if e in ("java", "scala"):
                yield e


def test_q3_final(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = {(r.ext, r["count"]) for r in R.question_three(cdf).collect()}
    want = set(Counter(_java_scala(commits)).items())
    assert got == want


def test_q3_running(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = Counter((r.ext, r["count"]) for r in R.question_three_running(cdf).collect())
    want = Counter()
    for e, total in Counter(_java_scala(commits)).items():
        for k in range(1, total + 1):
            want[(e, k)] += 1
    assert got == want


def test_q4(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = {(r.ext, r.status, r.sum_changes) for r in R.question_four(cdf).collect()}
    agg = defaultdict(int)
    for c in commits:
        for f in c["files"]:
            name = f["filename"]
            if name is None or not (name.endswith(".js") or name.endswith(".py")):
                continue
            ext = ".js" if name.endswith(".js") else ".py"
            status = f["status"] if f["status"] is not None else "unknown"
            agg[(ext, status)] += f["changes"]
    assert got == {(ext, status, n) for (ext, status), n in agg.items()}


def test_q5(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = {(r.date, r["count"]) for r in R.question_five(cdf).collect()}
    per_day = Counter(
        _day_str(_epoch_s(c["commit"]["committer"]["date"]) // 86400 * 86400) for c in commits
    )
    assert got == set(per_day.items())


def test_q6(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = {
        (r.window_start.strftime("%Y-%m-%d %H:%M:%S"), r.commit_type, r["count"])
        for r in R.question_six(cdf).collect()
    }
    agg = Counter()
    for c in commits:
        total = c["stats"]["total"] if c["stats"] else 0
        typ = "large" if total > 20 else "small"
        t = _epoch_s(c["commit"]["committer"]["date"])
        bucket = t // 43200 * 43200
        for i in range(4):
            agg[(_fmt(bucket - i * 43200), typ)] += 1
    assert got == {(w, t, n) for (w, t), n in agg.items()}


def test_q7(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    rows = R.question_seven(cdf).collect()
    got = {
        (r.repo, r.date, r.amountOfCommits, r.amountOfCommitters, r.totalChanges, r.mostPopularCommitter)
        for r in rows
    }
    buckets = defaultdict(list)
    for c in commits:
        t = _epoch_s(c["commit"]["committer"]["date"])
        buckets[(_repo(c["url"]), t // 86400 * 86400)].append(c)
    want = set()
    for (repo, day), cs in buckets.items():
        names = Counter(c["commit"]["committer"]["name"] for c in cs)
        n_commits = len(cs)
        n_committers = len(names)
        if not (n_commits > 20 and n_committers <= 2):
            continue
        total = sum((c["stats"]["total"] if c["stats"] else 0) for c in cs)
        mx = max(names.values())
        top = ",".join(sorted(n for n, k in names.items() if k == mx))
        want.add((repo, _day_str(day), n_commits, n_committers, total, top))
    assert len(rows) > 0 and got == want


def test_q8(frames, corpora):
    commits, geo, _, _ = corpora
    cdf, gdf = frames
    got = {
        (r.window_start.strftime("%Y-%m-%d %H:%M:%S"), r.continent, r.changes)
        for r in R.question_eight(cdf, gdf).collect()
    }
    geo_by_sha = defaultdict(list)
    for g in geo:
        geo_by_sha[g["sha"]].append(g)
    agg = defaultdict(int)
    for c in commits:
        cts = _epoch_s(c["commit"]["committer"]["date"])
        for f in c["files"]:
            if f["filename"] is None or not f["filename"].endswith(".java"):
                continue
            for g in geo_by_sha.get(c["sha"], []):
                gts = _epoch_s(g["createdAt"])
                if cts - 3600 <= gts <= cts + 1800:
                    jts = max(cts, gts)
                    week = jts // 604800 * 604800
                    agg[(_fmt(week), g["continent"])] += f["changes"]
    assert len(got) > 0 and got == {(w, cont, n) for (w, cont), n in agg.items()}


def test_q9(frames, corpora):
    commits, _, _, _ = corpora
    cdf, _ = frames
    got = Counter((r.repo, r.filename) for r in R.question_nine(cdf).collect())
    events = []
    for c in commits:
        t = _epoch_s(c["commit"]["committer"]["date"])
        repo = _repo(c["url"])
        for f in c["files"]:
            if f["filename"] is not None and f["status"] in ("added", "removed"):
                events.append((repo, f["filename"], f["status"], t))
    want = Counter()
    adds = [e for e in events if e[2] == "added"]
    rems = [e for e in events if e[2] == "removed"]
    for repo, fname, _, at in adds:
        matches = [t for r2, f2, _, t in rems if r2 == repo and f2 == fname and at < t <= at + 86400]
        if matches:
            want[(repo, fname)] += 1
    # the planted sequences must be present
    assert want[("tiny/repo", "src/x.java")] >= 1
    assert ("tiny/repo", "src/y.py") not in want
    assert got == want
