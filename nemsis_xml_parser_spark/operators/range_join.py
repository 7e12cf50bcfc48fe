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
