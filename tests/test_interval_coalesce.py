"""coalesce_intervals (operators/range_join.py): hypothesis properties
against a pure-Python reference — disjointness, coverage preservation,
member accounting, determinism."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nemsis_xml_parser_spark.operators.range_join import coalesce_intervals

interval = st.tuples(
    st.integers(0, 3),      # key
    st.integers(0, 40),     # start
    st.integers(0, 25),     # width (0 = zero-width interval)
)


def _reference(rows):
    """Merge [s, e) intervals per key by sweeping in sorted order —
    touching (prev_end == start) merges, matching the operator."""
    out = {}
    by_key = {}
    for k, s, w in rows:
        by_key.setdefault(k, []).append((s, s + w))
    for k, ivs in by_key.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e), merged[-1][2] + 1)
            else:
                merged.append((s, e, 1))
        out[k] = merged
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(interval, min_size=1, max_size=40))
def test_matches_sweep_reference(spark, rows):
    df = spark.createDataFrame(
        [(k, s, s + w, i) for i, (k, s, w) in enumerate(rows)],
        "key long, s long, e long, rid long",
    )
    got = coalesce_intervals(df, "key", "s", "e", tiebreak="rid").collect()
    by_key: dict[int, list] = {}
    for r in got:
        by_key.setdefault(r["key"], []).append((r["s"], r["e"], r["n_merged"]))
    for k in by_key:
        by_key[k].sort()
    want = _reference(rows)
    assert by_key == want
    # structural properties, independent of the reference:
    for k, islands in by_key.items():
        for (s1, e1, _), (s2, _, _) in zip(islands, islands[1:]):
            assert e1 < s2  # strictly disjoint, non-touching
        assert sum(n for _, _, n in islands) == sum(
            1 for kk, _, _ in rows if kk == k
        )


def test_deterministic_island_ids(spark):
    rows = [(1, 0, 5, 0), (1, 0, 5, 1), (1, 10, 12, 2), (1, 11, 20, 3)]
    df = spark.createDataFrame(rows, "key long, s long, e long, rid long")
    a = sorted(map(tuple, coalesce_intervals(df, "key", "s", "e", "rid").collect()))
    b = sorted(map(tuple, coalesce_intervals(df, "key", "s", "e", "rid").collect()))
    assert a == b
    assert [r[4] for r in a] == [2, 2]  # two islands of two members each
