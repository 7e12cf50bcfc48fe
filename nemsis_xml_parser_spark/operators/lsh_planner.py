"""Cost-based MinHash-LSH parameter planner — (bands, rows) from a target
Jaccard threshold and false-negative / false-positive budgets.

Standard S-curve algebra (Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch. 3): with ``b`` bands of ``r`` rows each, a pair with true
Jaccard ``s`` collides in at least one band with probability

    p(s) = 1 - (1 - s^r)^b

The curve's 50% point sits near (1/b)^(1/r).  Raising ``r`` sharpens the
curve (fewer false positives below the threshold), raising ``b`` shifts
it left (fewer false negatives above it); hash budget is n = b*r.  Until
round 5 every dedup query hand-set (b, r); this planner derives them
from the stated intent so the choice is documented and re-derivable:

- ``plan_minhash_lsh(0.3, num_hashes=16, fn_budget=0.05)`` → 16 one-row
  bands: the only split of 16 hashes that catches ≥95% of J≥0.3 pairs —
  the candidate-rich verify-everything posture of
  ``dedup_minhash_lsh_candidates``.
- ``plan_minhash_lsh(0.9, num_hashes=16, fp_jaccard=0.2)`` → 4 bands of
  4: near-dup families (J≈0.9+) caught at ≥95% while J≤0.2 template
  collisions stay under 5% — the default posture of
  ``minhash_lsh_pairs`` / the soak tier.

FP cost is quadratic in bucket size, so when a corpus can violate the
planned FP budget adversarially (hot templates), pair the plan with
``minhash_lsh_pairs(max_bucket=...)`` — the planner bounds the expected
candidate rate, the cap bounds the worst case.
"""

from __future__ import annotations

from dataclasses import dataclass

# candidate hash budgets for the auto-n search, cheapest first
_N_CANDIDATES = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def collision_prob(s: float, bands: int, rows: int) -> float:
    """P[pair with Jaccard ``s`` shares ≥1 band bucket]."""
    return 1.0 - (1.0 - s**rows) ** bands


@dataclass(frozen=True)
class LshPlan:
    num_hashes: int
    bands: int
    rows_per_band: int
    target_jaccard: float
    fn_at_target: float  # P[miss a pair at the target Jaccard]
    fp_jaccard: float | None
    fp_at_low: float | None  # P[candidate at the FP reference Jaccard]

    @property
    def s50(self) -> float:
        """Jaccard at which collision probability crosses ~50%."""
        return (1.0 / self.bands) ** (1.0 / self.rows_per_band)

    def prob(self, s: float) -> float:
        return collision_prob(s, self.bands, self.rows_per_band)


def plan_minhash_lsh(
    target_jaccard: float,
    *,
    num_hashes: int | None = None,
    fn_budget: float = 0.05,
    fp_jaccard: float | None = None,
    fp_budget: float = 0.05,
) -> LshPlan:
    """Pick (num_hashes, bands, rows) meeting the stated budgets.

    ``target_jaccard``: pairs at or above this similarity must become
    candidates with probability ≥ 1 - ``fn_budget`` (p is monotone in s,
    so the bound holds above the target too).  ``fp_jaccard`` (optional):
    pairs at or below this similarity must become candidates with
    probability ≤ ``fp_budget``.  ``num_hashes`` fixes the hash budget
    (all factorizations b*r = n are considered); when None the smallest
    feasible budget from {8..256} is chosen.  Among feasible splits of
    the chosen budget the one with the lowest FP rate (then fewest
    bands) wins.  Raises ValueError when no split satisfies the budgets
    — with the near-miss diagnostics, since the fix is usually more
    hashes or a looser budget.
    """
    if not 0.0 < target_jaccard <= 1.0:
        raise ValueError(f"target_jaccard must be in (0, 1], got {target_jaccard}")
    if fp_jaccard is not None and fp_jaccard >= target_jaccard:
        raise ValueError(
            f"fp_jaccard ({fp_jaccard}) must be below target_jaccard "
            f"({target_jaccard})"
        )
    budgets = (num_hashes,) if num_hashes is not None else _N_CANDIDATES
    best_miss: tuple[float, int, int] | None = None
    for n in budgets:
        feasible: list[tuple[float, int, int]] = []  # (fp, bands, rows)
        for bands in range(1, n + 1):
            if n % bands:
                continue
            rows = n // bands
            fn = 1.0 - collision_prob(target_jaccard, bands, rows)
            fp = (
                collision_prob(fp_jaccard, bands, rows)
                if fp_jaccard is not None
                else 0.0
            )
            if fn <= fn_budget and (fp_jaccard is None or fp <= fp_budget):
                feasible.append((fp, bands, rows))
            miss = max(fn - fn_budget, 0.0) + max(fp - fp_budget, 0.0)
            if best_miss is None or miss < best_miss[0]:
                best_miss = (miss, bands, rows)
        if feasible:
            fp, bands, rows = min(feasible)
            return LshPlan(
                num_hashes=n,
                bands=bands,
                rows_per_band=rows,
                target_jaccard=target_jaccard,
                fn_at_target=round(
                    1.0 - collision_prob(target_jaccard, bands, rows), 6
                ),
                fp_jaccard=fp_jaccard,
                fp_at_low=round(fp, 6) if fp_jaccard is not None else None,
            )
    assert best_miss is not None
    raise ValueError(
        f"no (bands, rows) split satisfies fn<={fn_budget} at "
        f"J={target_jaccard}"
        + (f", fp<={fp_budget} at J={fp_jaccard}" if fp_jaccard is not None else "")
        + f" within budget {budgets}; closest was bands={best_miss[1]}, "
        f"rows={best_miss[2]} (excess {best_miss[0]:.4f}) — add hashes or "
        "loosen a budget"
    )
