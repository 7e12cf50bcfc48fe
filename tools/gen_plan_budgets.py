"""Record the physical-plan budget for every registered query.

Writes tools/plan_budgets.json: per query, the number of Exchanges
(shuffles), CartesianProducts, and BroadcastNestedLoopJoins in the
pre-AQE physical plan at sf0.001.  tests/test_plan_audit.py fails any
query whose plan grows beyond its recorded budget — a regression gate on
accidental shuffle/cartesian introduction.

Usage: python tools/gen_plan_budgets.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

BUDGET_PATH = Path(__file__).with_name("plan_budgets.json")


def plan_stats(df) -> dict[str, int]:
    # executed plan (post-EnsureRequirements): Exchange nodes are present;
    # with AQE this is the initial physical plan, which is what we budget
    spark = df.sparkSession
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    ops = re.findall(r"^\s*\(\d+\)\s+(\w+)", plan, re.MULTILINE)
    return {
        "exchanges": sum(o == "Exchange" for o in ops),
        "cartesian": sum(o == "CartesianProduct" for o in ops),
        "bnlj": sum(o == "BroadcastNestedLoopJoin" for o in ops),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-budgets")
    budgets: dict[str, dict[str, int]] = {}
    for name, q in QUERIES.items():
        try:
            budgets[name] = plan_stats(q.spark(spark, sf_dir))
        except Exception as e:  # pragma: no cover
            print(f"SKIP {name}: {e}", file=sys.stderr)
    BUDGET_PATH.write_text(json.dumps(budgets, indent=1, sort_keys=True) + "\n")
    print(f"wrote {BUDGET_PATH} ({len(budgets)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
