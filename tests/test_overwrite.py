"""Key-scoped overwrite semantics (SURVEY D2/D3, FIXTURES F1 re-ingest)."""

import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators.flatten import flatten_xml_strings
from nemsis_xml_parser_spark.operators.overwrite import (
    distinct_pcr_uuids,
    overwrite_by_key,
)
from tests.conftest import NEMSIS_XML


def test_distinct_pcr_uuids(spark):
    els = flatten_xml_strings(spark, [("f.xml", NEMSIS_XML)])
    got = {r["pcr_uuid"] for r in distinct_pcr_uuids(els).collect()}
    assert got == {
        "6e5d2c1a-0000-4000-8000-000000000001",
        "6e5d2c1a-0000-4000-8000-000000000002",
    }


def test_reingest_same_keys_replaces(spark):
    els = flatten_xml_strings(spark, [("f.xml", NEMSIS_XML)])
    n_keyed = els.where(F.col("pcr_uuid").isNotNull()).count()
    n_null = els.where(F.col("pcr_uuid").isNull()).count()
    once = overwrite_by_key(els.limit(0), els)
    twice = overwrite_by_key(once, els)
    # keyed rows are replaced, not duplicated
    assert twice.where(F.col("pcr_uuid").isNotNull()).count() == n_keyed
    # NULL-keyed rows duplicate — faithful to the reference, whose
    # delete-by-UUID can't target them (main_ingest.py:312-316); the
    # pipeline's MD5 skip (D5) covers the identical-file case instead
    assert twice.where(F.col("pcr_uuid").isNull()).count() == 2 * n_null
    # keyed content identical to a single ingest
    assert (
        twice.where(F.col("pcr_uuid").isNotNull())
        .select("element_tag", "pcr_uuid", "value")
        .exceptAll(
            els.where(F.col("pcr_uuid").isNotNull()).select(
                "element_tag", "pcr_uuid", "value"
            )
        )
        .count()
        == 0
    )


def test_overwrite_keeps_other_keys_and_nulls(spark):
    xml_a = '<r><PatientCareReport UUID="A"><x>1</x></PatientCareReport><keep>y</keep></r>'
    xml_b = '<r><PatientCareReport UUID="A"><x>2</x></PatientCareReport></r>'
    xml_c = '<r><PatientCareReport UUID="C"><x>3</x></PatientCareReport></r>'
    a = flatten_xml_strings(spark, [("a.xml", xml_a)])
    c = flatten_xml_strings(spark, [("c.xml", xml_c)])
    existing = a.unionByName(c)
    b = flatten_xml_strings(spark, [("b.xml", xml_b)])
    merged = overwrite_by_key(existing, b)
    vals = {
        (r["pcr_uuid"], r["value"])
        for r in merged.where(F.col("element_tag") == "x").collect()
    }
    assert vals == {("A", "2"), ("C", "3")}  # A replaced, C kept
    # NULL-keyed rows (outside any report) always survive
    assert merged.where(F.col("element_tag") == "keep").count() == 1
