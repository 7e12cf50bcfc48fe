"""Run the full --tz Asia/Tokyo correctness sweep and write the
round's CORRECTNESS_tz artifact (per-query statuses, totals, no
appended rows — total must equal the registry size).

Usage: python tools/tz_sweep_artifact.py <round> [sf_dir]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/check_correctness.py",
            "--tz",
            "Asia/Tokyo",
            sf_dir,
        ],
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr[-2000:])
    queries: dict[str, dict] = {}
    n_pass = n_fail = n_rows = 0
    failures = []
    for line in proc.stdout.splitlines():
        line = line.strip().split("\r")[-1]
        m = re.match(r"(PASS|FAIL|ROWS-ONLY)\s+(\w+):", line)
        if not m:
            continue
        status, name = m.group(1), m.group(2)
        if status == "PASS":
            queries[name] = {"status": "pass"}
            n_pass += 1
        elif status == "ROWS-ONLY":
            queries[name] = {"status": "rows_only"}
            n_rows += 1
        else:
            queries[name] = {"status": "fail", "detail": line[:400]}
            n_fail += 1
            failures.append(name)
    from nemsis_xml_parser_spark.plans import QUERIES

    total = len(queries)
    artifact = {
        "metric": "tz_sweep_correctness",
        "tz": "Asia/Tokyo",
        "sf_dir": sf_dir,
        "tool": (
            "tools/check_correctness.py --tz Asia/Tokyo (exact cell "
            "equality, stricter than driver hash)"
        ),
        "round": rnd,
        "note": (
            "end-of-session definitive sweep over the FINAL registry — "
            "no appended rows, total = registry size"
        ),
        "pass": n_pass,
        "fail": n_fail,
        "rows_only": n_rows,
        "total": total,
        "registry_size": len(QUERIES),
        "failures": failures,
        "queries": queries,
    }
    out = f"/root/repo/CORRECTNESS_tz_r{rnd:02d}.json"
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=False)
    print(
        f"wrote {out}: pass={n_pass} fail={n_fail} rows_only={n_rows} "
        f"total={total} registry={len(QUERIES)}"
    )
    return 0 if (n_fail == 0 and total == len(QUERIES)) else 1


if __name__ == "__main__":
    raise SystemExit(main())
