"""ETL ingest throughput bench — the reference's own workload, measured.

The reference ingests one XML file at a time, one SQL INSERT round-trip per
element on a single thread (/root/reference/main_ingest.py:429-495).  This
bench runs OUR pipeline (distributed flatten → per-tag warehouse fan-out →
bookkeeping) over N synthetic NEMSIS files and reports elements/sec, the
number to hold against any single-node ingestor at the same element count.

Usage: python tools/bench_ingest.py [n_files] [pcrs_per_file]
Prints one JSON line: {"metric": "ingest_elements_per_sec", ...}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from nemsis_xml_parser_spark.operators.bookkeeping import ingest_xml_files  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

PCR_TEMPLATE = """  <Header>
    <PatientCareReport UUID="pcr-{fid}-{pid}">
      <eRecord><eRecord.01>rec-{fid}-{pid}</eRecord.01></eRecord>
      <eTimes>
        <eTimes.01>2025-02-15T12:0{t}:00-05:00</eTimes.01>
        <eTimes.03>2025-02-15T12:1{t}:00-05:00</eTimes.03>
      </eTimes>
      <eVitals VitalGroup="g{pid}">
        <eVitals.01>2025-02-15T12:15:00-05:00</eVitals.01>
        <eVitals.06 units="mmHg">1{t}0</eVitals.06>
        <eVitals.10>9{t}</eVitals.10>
        <eVitals.14>3{t}</eVitals.14>
      </eVitals>
      <eDisposition>
        <eDisposition.12 code="43{t}">Treated</eDisposition.12>
      </eDisposition>
    </PatientCareReport>
  </Header>
"""


def make_file(fid: int, pcrs: int) -> str:
    body = "".join(
        PCR_TEMPLATE.format(fid=fid, pid=p, t=p % 10) for p in range(pcrs)
    )
    return f'<EMSDataSet xmlns="http://www.nemsis.org">\n{body}</EMSDataSet>\n'


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    pcrs = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    work = Path(tempfile.mkdtemp(prefix="ingest_bench_"))
    src = work / "xml"
    src.mkdir()
    for f in range(n_files):
        (src / f"file_{f:05d}.xml").write_text(make_file(f, pcrs))

    # 13 elements per PCR subtree + 1 root per file
    n_elements = n_files * (pcrs * 13 + 1)

    spark = get_spark("ingest-bench")
    wh = str(work / "warehouse")
    t0 = time.time()
    statuses = ingest_xml_files(
        spark, [str(p) for p in sorted(src.iterdir())], wh, deterministic_ids=True
    )
    elapsed = time.time() - t0

    ok = sum(1 for s in statuses.values() if s.startswith("Staged"))
    print(
        json.dumps(
            {
                "metric": "ingest_elements_per_sec",
                "value": round(n_elements / elapsed, 1),
                "unit": "elements/sec",
                "n_files": n_files,
                "n_elements": n_elements,
                "elapsed_sec": round(elapsed, 2),
                "files_ok": ok,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
