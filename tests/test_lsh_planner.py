"""S-curve LSH planner (operators/lsh_planner.py): known operating
points, budget feasibility, monotonicity, failure diagnostics."""

from __future__ import annotations

import math

import pytest

from nemsis_xml_parser_spark.operators.lsh_planner import (
    LshPlan,
    collision_prob,
    plan_minhash_lsh,
)


def test_collision_prob_closed_form():
    # b=4, r=4, s=0.9: 1 - (1 - 0.9^4)^4
    assert math.isclose(collision_prob(0.9, 4, 4), 1 - (1 - 0.9**4) ** 4)
    assert collision_prob(1.0, 4, 4) == 1.0
    assert collision_prob(0.0, 4, 4) == 0.0


def test_default_posture_is_4x4():
    # the minhash_lsh_pairs default documented in its docstring
    plan = plan_minhash_lsh(0.9, num_hashes=16, fp_jaccard=0.2)
    assert (plan.num_hashes, plan.bands, plan.rows_per_band) == (16, 4, 4)
    assert plan.fn_at_target <= 0.05
    assert plan.fp_at_low <= 0.05
    assert 0.6 < plan.s50 < 0.8  # (1/4)^(1/4) ≈ 0.707


def test_max_recall_posture_is_one_row_bands():
    # the dedup_minhash_lsh_candidates posture: catch J>=0.3 within 16
    # hashes — only 16 one-row bands is feasible
    plan = plan_minhash_lsh(0.3, num_hashes=16, fn_budget=0.05)
    assert (plan.bands, plan.rows_per_band) == (16, 1)


def test_auto_budget_picks_smallest_feasible():
    plan = plan_minhash_lsh(0.9, fn_budget=0.05, fp_jaccard=0.2)
    # 12 hashes as 3 bands of 4 already meets both budgets; 8 does not
    assert plan.num_hashes == 12
    assert (plan.bands, plan.rows_per_band) == (3, 4)
    with pytest.raises(ValueError):
        plan_minhash_lsh(0.9, num_hashes=8, fn_budget=0.05, fp_jaccard=0.2)


def test_plan_prob_is_monotone_in_s():
    plan = plan_minhash_lsh(0.8, num_hashes=32, fp_jaccard=0.2)
    probs = [plan.prob(s / 10) for s in range(11)]
    assert probs == sorted(probs)
    assert plan.prob(plan.target_jaccard) >= 0.95


def test_infeasible_raises_with_diagnostics():
    # impossibly sharp: 99.9% recall at 0.35 AND <0.1% FPs at 0.3 — no
    # split of any budget separates two Jaccards this close
    with pytest.raises(ValueError, match="add hashes or loosen"):
        plan_minhash_lsh(
            0.35, fn_budget=0.001, fp_jaccard=0.3, fp_budget=0.001
        )


def test_validation():
    with pytest.raises(ValueError):
        plan_minhash_lsh(0.0)
    with pytest.raises(ValueError):
        plan_minhash_lsh(0.5, fp_jaccard=0.6)


def test_plan_is_frozen_dataclass():
    plan = plan_minhash_lsh(0.9, num_hashes=16, fp_jaccard=0.2)
    assert isinstance(plan, LshPlan)
    with pytest.raises(Exception):
        plan.bands = 1  # type: ignore[misc]
