"""Banded range join — the equi-join scale path for point-in-interval
joins where NEITHER side is broadcastable (the prompt-level "range join"
custom operator; a broadcastable side should just use a plain non-equi
condition, see plans.families.join_range_band).

A naive point-in-interval join is a BroadcastNestedLoopJoin /
CartesianProduct — O(|points| × |intervals|).  Banding makes it an
equi-join: every interval explodes into the fixed-width bands it overlaps,
every point computes its band, the join key is the band id, and a residual
range filter restores exact semantics.  Cost: |intervals| × (avg span /
band_width) replicated rows, shuffled once on the band id — linear, AQE
handles skewed bands.  Result-identical to the naive join (oracle-checked
in plans.families3.join_range_interval_banded and hypothesis-tested).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi``, via fixed-width band equi-join.

    The interval side gains one row per overlapped band (floor(lo/w) ..
    floor(hi/w) inclusive — the hi band may over-cover, the residual
    filter corrects it).  Column names must not collide across sides
    except the band key this function adds.
    """
    w = float(band_width)
    p = points.withColumn("__band", F.floor(F.col(point_col) / w).cast("long"))
    i = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    return (
        p.join(i, ["__band"], how)
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__band")
    )


def coalesce_intervals(
    df,
    key: str,
    start: str,
    end: str,
    tiebreak: str | None = None,
):
    """Temporal PACK (SQL:2016 normalization): merge overlapping or
    touching [start, end) intervals per ``key`` into maximal disjoint
    islands — (key, island, start, end, n_merged).

    Classic two-window gaps-and-islands, both windows PARTITIONED by the
    key (scale-safe, no global ordering): the running max of prior ends
    flags island openers, a running sum of the flags numbers islands,
    one aggregate per (key, island) closes them.  ``tiebreak`` (extra
    ordering column) makes runs deterministic when identical intervals
    repeat.  Touching intervals (prev_end == start) merge; a zero-width
    interval at an island edge therefore extends nothing but still
    counts as a member.
    """
    from pyspark.sql import Window

    order = [F.col(start).asc(), F.col(end).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w_prev = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.select(
        key,
        start,
        end,
        *( [tiebreak] if tiebreak is not None else [] ),
        F.when(F.max(end).over(w_prev) >= F.col(start), 0)
        .otherwise(1)
        .alias("__new_island"),
    )
    islands = flagged.withColumn("island", F.sum("__new_island").over(w_cum))
    return islands.groupBy(key, "island").agg(
        F.min(start).alias(start),
        F.max(end).alias(end),
        F.count(F.lit(1)).alias("n_merged"),
    )
