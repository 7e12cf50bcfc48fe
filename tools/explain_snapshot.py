"""Dump .explain("formatted") for registered queries to text files.

Usage: python tools/explain_snapshot.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (all headline
queries when none are named).  Plan-only: builds the DataFrame and
formats the physical plan without running a job, so it is safe to run
alongside other work (no executors are exercised).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-snapshot")
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "->", f"{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
