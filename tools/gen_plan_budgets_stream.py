"""Record per-microbatch plan budgets for the foreachBatch streaming
pipelines into tools/plan_budgets_stream.json — exchanges, cartesian
products, broadcast nested-loop joins AND coalesce counts (the
coalesce-above-narrow-producer collapse is this family's signature
regression; see tools/stream_plan_frames.py).

After an INTENTIONAL plan change: re-run this and commit the diff.

Usage: python tools/gen_plan_budgets_stream.py
"""

from __future__ import annotations

import json
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BUDGET_PATH = Path(__file__).parent / "plan_budgets_stream.json"


def stream_plan_stats(df) -> dict[str, int]:
    spark = df.sparkSession
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    ops = re.findall(r"^\s*\(\d+\)\s+(\w+)", plan, re.MULTILINE)
    return {
        "exchanges": sum(o == "Exchange" for o in ops),
        "cartesian": sum(o == "CartesianProduct" for o in ops),
        "bnlj": sum(o == "BroadcastNestedLoopJoin" for o in ops),
        "coalesce": sum(o == "Coalesce" for o in ops),
    }


# ops pinned in LIVE MicroBatchExecution plans (tree format, captured
# after one availableNow drain — see stream_plan_frames.stream_live_plans).
# Stateful-op counts are the contract: a windowed agg losing its
# StateStoreSave (e.g. a watermark column silently dropped) or a
# stream-stream join degrading out of StreamingSymmetricHashJoin is a
# correctness regression that no batch frame can see.
LIVE_OPS = {
    "exchanges": r"\bExchange\b",  # no match inside Reused/BroadcastExchange
    "cartesian": r"\bCartesianProduct\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "coalesce": r"\bCoalesce\b",
    "state_store_save": r"\bStateStoreSave\b",
    "streaming_dedup": r"\bStreamingDeduplicate(?:WithinWatermark)?\b",
    "streaming_join": r"\bStreamingSymmetricHashJoin\b",
}


def live_plan_stats(plan: str) -> dict[str, int]:
    return {
        name: len(re.findall(pat, plan, re.MULTILINE))
        for name, pat in LIVE_OPS.items()
    }


def main() -> None:
    from nemsis_xml_parser_spark.session import get_spark
    from tools.stream_plan_frames import (
        stream_batch_frames,
        stream_live_plans,
    )

    spark = get_spark("stream-plan-budgets")
    # the streams plan their batch bodies under these scoped overrides
    for key, val in (
        ("spark.sql.shuffle.partitions", "4"),
        ("spark.sql.files.minPartitionNum", "4"),
        ("spark.sql.adaptive.enabled", "false"),
    ):
        spark.conf.set(key, val)
    with tempfile.TemporaryDirectory(prefix="stream_budget_") as root:
        frames = stream_batch_frames(spark, root)
        budgets = {
            name: stream_plan_stats(df) for name, df in frames.items()
        }
        budgets["__live__"] = {
            name: live_plan_stats(plan)
            for name, plan in stream_live_plans(spark, root).items()
        }
    BUDGET_PATH.write_text(
        json.dumps(budgets, indent=1, sort_keys=True) + "\n"
    )
    print(
        f"wrote {BUDGET_PATH} ({len(budgets) - 1} frames + "
        f"{len(budgets['__live__'])} live plans)"
    )


if __name__ == "__main__":
    main()
