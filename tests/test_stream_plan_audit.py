"""Physical-plan regression gate over the foreachBatch streaming
pipelines' batch bodies (the streaming counterpart of
test_plan_audit.py's 374-query batch gate).

tools/plan_budgets_stream.json records, per batch-body frame, the
Exchange / CartesianProduct / BroadcastNestedLoopJoin / Coalesce
counts.  Coalesce is pinned EXACTLY (not as an upper bound): this
family's signature regression is a ``coalesce`` landing above a
narrow producer and silently collapsing the whole compute stage to a
handful of tasks (NOTES.md gotcha 12) — a DROP in coalesce count is
as suspicious as a rise, because the sketch folds rely on their
post-aggregate coalesce(1) to keep state single-file.  After an
INTENTIONAL plan change, re-run
``python tools/gen_plan_budgets_stream.py`` and commit the diff.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.gen_plan_budgets_stream import (  # noqa: E402
    BUDGET_PATH,
    stream_plan_stats,
)
from tools.stream_plan_frames import stream_batch_frames  # noqa: E402


@pytest.fixture(scope="module")
def budgets():
    assert BUDGET_PATH.exists(), (
        "run python tools/gen_plan_budgets_stream.py first"
    )
    return json.loads(BUDGET_PATH.read_text())


def test_stream_batch_plans_within_budget(spark, tmp_path, budgets):
    prev = {}
    for key, val in (
        ("spark.sql.shuffle.partitions", "4"),
        ("spark.sql.files.minPartitionNum", "4"),
        ("spark.sql.adaptive.enabled", "false"),
    ):
        prev[key] = spark.conf.get(key, None)
        spark.conf.set(key, val)
    try:
        frames = stream_batch_frames(spark, str(tmp_path))
        missing = sorted(set(frames) - (set(budgets) - {"__live__"}))
        assert not missing, (
            f"frames with no stream plan budget: {missing} — run "
            "python tools/gen_plan_budgets_stream.py"
        )
        failures = []
        for name, df in sorted(frames.items()):
            stats = stream_plan_stats(df)
            b = budgets[name]
            if stats["cartesian"] > 0:
                failures.append(f"{name}: CartesianProduct in plan")
            if stats["exchanges"] > b["exchanges"]:
                failures.append(
                    f"{name}: {stats['exchanges']} exchanges > "
                    f"budget {b['exchanges']}"
                )
            if stats["bnlj"] > b["bnlj"]:
                failures.append(
                    f"{name}: {stats['bnlj']} BNLJ > budget {b['bnlj']}"
                )
            if stats["coalesce"] != b["coalesce"]:
                failures.append(
                    f"{name}: {stats['coalesce']} Coalesce != pinned "
                    f"{b['coalesce']} (a new coalesce above a narrow "
                    "producer collapses the compute stage; a lost one "
                    "un-bounds sketch state files)"
                )
        assert not failures, "\n".join(failures)
    finally:
        for key, val in prev.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


def test_stream_live_plans_within_budget(spark, tmp_path, budgets):
    """The STATEFUL pipelines, run live for one availableNow drain:
    exchanges bounded, cartesian forbidden, and the stateful-operator
    counts pinned EXACTLY — a windowed aggregate losing its
    StateStoreSave (watermark column dropped) or the stream-stream join
    degrading out of StreamingSymmetricHashJoin is a correctness
    regression no batch frame can catch."""
    from tools.gen_plan_budgets_stream import live_plan_stats
    from tools.stream_plan_frames import stream_live_plans

    assert "__live__" in budgets, (
        "run python tools/gen_plan_budgets_stream.py first"
    )
    live_budgets = budgets["__live__"]
    plans = stream_live_plans(spark, str(tmp_path))
    missing = sorted(set(plans) - set(live_budgets))
    assert not missing, (
        f"live pipelines with no budget: {missing} — run "
        "python tools/gen_plan_budgets_stream.py"
    )
    failures = []
    for name, plan in sorted(plans.items()):
        stats = live_plan_stats(plan)
        b = live_budgets[name]
        if stats["cartesian"] > 0:
            failures.append(f"{name}: CartesianProduct in live plan")
        if stats["exchanges"] > b["exchanges"]:
            failures.append(
                f"{name}: {stats['exchanges']} exchanges > "
                f"budget {b['exchanges']}"
            )
        if stats["bnlj"] > b["bnlj"]:
            failures.append(
                f"{name}: {stats['bnlj']} BNLJ > budget {b['bnlj']}"
            )
        for op in ("state_store_save", "streaming_dedup", "streaming_join",
                   "coalesce"):
            if stats[op] != b[op]:
                failures.append(
                    f"{name}: {op}={stats[op]} != pinned {b[op]}"
                )
    assert not failures, "\n".join(failures)
