"""Interleaved fresh-JVM headline benchmark: CURRENT code vs a base
commit, time-adjacent alternation (NOTES gotcha 18 — whole-machine
drift swings absolute totals 10-40% across hours, so only interleaved
per-query medians are comparable across rounds).

For each rep this runs ``python bench.py`` in a fresh process and
SNAPSHOTS the full per-query map that bench.py writes next to itself
(``BENCH_full.json`` — stdout carries only the top-10; NOTES gotcha
22), alternating current-repo and base-commit-worktree runs:
cur, base, cur, base, cur.  Prints ONE JSON line in the
BENCH_REPS_r{N} shape (rep totals, per-query-median totals on the
shared query set, the >1.25x & >1s regression gate, new-query
medians); the caller adds the round's narrative note and commits the
median-total current run as BENCH_full.json.

Usage: python tools/bench_interleave.py <base_commit> [n_cur_reps]
(n_base_reps = n_cur_reps - 1; default 3/2.)  Check `ps` for stray
JVMs first (gotcha 14); the worktree is created under /tmp and removed
afterwards.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path("/root/repo")


def _run_bench(cwd: Path) -> dict:
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        check=True,
    )
    # stdout's compact line proves rc/shape; the full map is the artifact
    json.loads(proc.stdout.strip().splitlines()[-1])
    return json.loads((cwd / "BENCH_full.json").read_text())


def main() -> None:
    base = sys.argv[1]
    n_cur = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wt = Path(tempfile.mkdtemp(prefix="bench_base_")) / "base"
    subprocess.run(
        ["git", "worktree", "add", str(wt), base],
        cwd=REPO, check=True, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        cur_runs: list[dict] = []
        base_runs: list[dict] = []
        for i in range(n_cur):
            cur_runs.append(_run_bench(REPO))
            if i < n_cur - 1:
                base_runs.append(_run_bench(wt))
        curq = [r["queries"] for r in cur_runs]
        baseq = [r["queries"] for r in base_runs]
        shared = sorted(set(curq[0]) & set(baseq[0]))

        def med(qs, n):
            return statistics.median(r[n] for r in qs)

        gate = [
            (n, round(med(baseq, n), 2), round(med(curq, n), 2))
            for n in shared
            if med(curq, n) > med(baseq, n) * 1.25
            and med(curq, n) - med(baseq, n) > 1.0
        ]
        out = {
            "metric": "headline_interleaved_reps",
            "base_commit": base,
            "cur_totals": [round(sum(q.values()), 1) for q in curq],
            "base_totals": [round(sum(q.values()), 1) for q in baseq],
            f"per_query_median_total_on_{len(shared)}_shared": {
                "cur": round(sum(med(curq, n) for n in shared), 1),
                "base": round(sum(med(baseq, n) for n in shared), 1),
            },
            "regressions_gate": gate,
            "new_query_medians": {
                n: round(med(curq, n), 2)
                for n in sorted(set(curq[0]) - set(baseq[0]))
            },
            "median_total_cur_run_index": sorted(
                range(len(curq)), key=lambda i: sum(curq[i].values())
            )[len(curq) // 2],
        }
        print(json.dumps(out))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=REPO, check=False, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        subprocess.run(
            ["git", "worktree", "prune"], cwd=REPO, check=False
        )


if __name__ == "__main__":
    main()
