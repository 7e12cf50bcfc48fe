"""Versioned-commit layer: atomic publish, crash invisibility, vacuum."""

import os

from nemsis_xml_parser_spark.operators import txlog


def _rows(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x long")


def test_commit_and_read_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    v0 = txlog.commit_table(_rows(spark, [1, 2, 3]), root, "t")
    assert v0 == 0
    assert {r["x"] for r in txlog.read_table(spark, root, "t").collect()} == {1, 2, 3}
    v1 = txlog.commit_table(_rows(spark, [4]), root, "t")
    assert v1 == 1
    assert {r["x"] for r in txlog.read_table(spark, root, "t").collect()} == {4}


def test_half_written_version_is_invisible(spark, tmp_path):
    root = str(tmp_path)
    txlog.commit_table(_rows(spark, [1]), root, "t")
    # simulate a crash mid-commit: v=1 data written, pointer NOT swapped
    _rows(spark, [99]).write.parquet(os.path.join(root, "t", "v=1"))
    assert {r["x"] for r in txlog.read_table(spark, root, "t").collect()} == {1}
    # the next real commit does not collide with the orphan... current stays
    # authoritative
    assert txlog.current_version(root, "t") == 0


def test_vacuum_keeps_recent_and_drops_orphans(spark, tmp_path):
    root = str(tmp_path)
    for vals in ([1], [2], [3], [4]):
        txlog.commit_table(_rows(spark, vals), root, "t")
    # orphan beyond the pointer (simulated crash of a 5th commit)
    _rows(spark, [99]).write.parquet(os.path.join(root, "t", "v=9"))
    removed = txlog.vacuum(root, "t", keep=2)
    assert set(removed) == {0, 1, 9}
    assert {r["x"] for r in txlog.read_table(spark, root, "t").collect()} == {4}
    dirs = {d for d in os.listdir(os.path.join(root, "t")) if d.startswith("v=")}
    assert dirs == {"v=2", "v=3"}
