"""Physical-plan audit: print pushdown/broadcast/shuffle evidence for
registered queries (the SCALING.md evidence trail).

Usage: python tools/audit_plans.py [sf_dir] [query ...]   (default: flagships)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from nemsis_xml_parser_spark.plans import QUERIES  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q13_customer_order_distribution",
    "q21_last_shipper_multi_supplier",
    "dedup_minhash_lsh_candidates",
    "ann_ivf_topk",
]

MARKERS = (
    "PushedFilters",
    "ReadSchema",
    "Broadcast",
    "SortMerge",
    "Exchange",
    "WholeStageCodegen",
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or DEFAULT
    spark = get_spark("audit")
    for name in names:
        print(f"=== {name}")
        df = QUERIES[name].spark(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        for line in plan.splitlines():
            s = line.strip()
            if any(m in s for m in MARKERS):
                print(" ", s[:160])
    spark.stop()


if __name__ == "__main__":
    main()
