"""Deterministic GitHub-commit-stream fixture for reference-query
golden tests (SURVEY §5: the reference was graded on golden outputs;
we reproduce that style with a generated corpus + independent
pure-Python oracles).

Coverage requirements from FIXTURES.md §A: null ``stats``; null
``files[].filename``; extensions {java, scala, js, py, md, no-dot};
``status`` ∈ {modified, added, removed, None}; urls with ``?query``
suffixes; top-committer ties; a (repo, day) bucket exceeding 20
commits with ≤ 2 committers; files added then removed within and
beyond 1 day; geo events inside and outside the [-1h, +30m] band.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2023, 3, 1, tzinfo=timezone.utc)

REPOS = ["apache/flink", "apache/spark", "tiny/repo"]
COMMITTERS = ["alice", "bob", "carol", "dave"]
EXTS = ["java", "scala", "js", "py", "md", ""]
STATUSES = ["modified", "added", "removed", None]
CONTINENTS = ["Europe", "Asia", "North-America"]


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def make_commits(n: int = 400, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    commits = []
    for i in range(n):
        # repo 'apache/flink' gets a dense day (day 0, committers
        # alice/bob only) to trigger Q7's HAVING(>20 commits, <=2
        # committers); other commits spread over 6 days
        if i < 30:
            repo = "dense/repo"  # not in REPOS: keeps its committer set to {alice, bob}
            ts = EPOCH + timedelta(hours=rng.randint(0, 23), minutes=rng.randint(0, 59))
            committer = rng.choice(["alice", "bob"])
        else:
            repo = rng.choice(REPOS)
            ts = EPOCH + timedelta(
                days=rng.randint(0, 5), hours=rng.randint(0, 23), minutes=rng.randint(0, 59)
            )
            committer = rng.choice(COMMITTERS)
        sha = f"sha{i:05d}"
        url = f"https://api.github.com/repos/{repo}/commits/{sha}"
        if rng.random() < 0.3:
            url += "?page=2&per_page=10"
        n_files = rng.randint(0, 4)
        files = []
        for j in range(n_files):
            ext = rng.choice(EXTS)
            fname = None if rng.random() < 0.15 else (
                f"src/f{rng.randint(0, 25)}" + (f".{ext}" if ext else "")
            )
            additions = rng.randint(0, 60)
            deletions = rng.randint(0, 60)
            files.append(
                {
                    "sha": f"blob{i}_{j}",
                    "filename": fname,
                    "status": rng.choice(STATUSES),
                    "additions": additions,
                    "deletions": deletions,
                    "changes": additions + deletions,
                }
            )
        has_stats = rng.random() > 0.25
        total_add = sum(f["additions"] for f in files)
        total_del = sum(f["deletions"] for f in files)
        commit = {
            "node_id": f"node{i}",
            "sha": sha,
            "url": url,
            "commit": {
                "author": {"name": committer, "email": f"{committer}@x.org", "date": _iso(ts)},
                "committer": {"name": committer, "email": f"{committer}@x.org", "date": _iso(ts)},
                "message": f"commit {i}",
                "tree": {"sha": f"tree{i}"},
                "comment_count": rng.randint(0, 3),
                "verification": {"verified": rng.random() < 0.5, "reason": "unsigned"},
            },
            "parents": [{"sha": f"sha{max(i - 1, 0):05d}"}],
            "stats": (
                {"total": total_add + total_del, "additions": total_add, "deletions": total_del}
                if has_stats
                else None
            ),
            "files": files,
        }
        commits.append(commit)

    # Q9 determinism: guarantee add→remove sequences for a known file
    def planted(i, repo, fname, status, ts):
        return {
            "node_id": f"noded{i}",
            "sha": f"shad{i:05d}",
            "url": f"https://api.github.com/repos/{repo}/commits/shad{i:05d}",
            "commit": {
                "author": {"name": "erin", "email": "e@x.org", "date": _iso(ts)},
                "committer": {"name": "erin", "email": "e@x.org", "date": _iso(ts)},
                "message": "planted",
                "tree": {"sha": f"treed{i}"},
                "comment_count": 0,
                "verification": {"verified": True, "reason": "valid"},
            },
            "parents": [],
            "stats": {"total": 10, "additions": 5, "deletions": 5},
            "files": [
                {
                    "sha": f"blobd{i}",
                    "filename": fname,
                    "status": status,
                    "additions": 5,
                    "deletions": 5,
                    "changes": 10,
                }
            ],
        }

    base = EPOCH + timedelta(days=10)
    commits += [
        # added then removed 2h later (match)
        planted(0, "tiny/repo", "src/x.java", "added", base),
        planted(1, "tiny/repo", "src/x.java", "removed", base + timedelta(hours=2)),
        # added then removed 2 days later (no match)
        planted(2, "tiny/repo", "src/y.py", "added", base),
        planted(3, "tiny/repo", "src/y.py", "removed", base + timedelta(days=2)),
        # two removes after one add within a day (first-match only)
        planted(4, "tiny/repo", "src/z.scala", "added", base),
        planted(5, "tiny/repo", "src/z.scala", "removed", base + timedelta(hours=1)),
        planted(6, "tiny/repo", "src/z.scala", "removed", base + timedelta(hours=3)),
    ]
    return commits


def make_geo(commits: list[dict], seed: int = 11) -> list[dict]:
    rng = random.Random(seed)
    geo = []
    for c in commits:
        ts = datetime.strptime(c["commit"]["committer"]["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
        r = rng.random()
        if r < 0.6:  # inside the [-1h, +30m] band
            offset = timedelta(minutes=rng.randint(-60, 30))
        elif r < 0.8:  # before the band
            offset = timedelta(minutes=-rng.randint(90, 300))
        else:  # after the band
            offset = timedelta(minutes=rng.randint(45, 300))
        geo.append(
            {
                "sha": c["sha"],
                "createdAt": _iso(ts + offset),
                "continent": rng.choice(CONTINENTS),
            }
        )
    return geo


def write_jsonl(rows: list[dict], path: str) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
