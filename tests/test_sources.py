"""Source connector tests: pipe-delimited definitions (FIXTURES F4/F5),
decode join (F2), vendor frame conversion (F6)."""

import pandas as pd
import pytest

from nemsis_xml_parser_spark.sources import definitions as DF
from nemsis_xml_parser_spark.sources import vendor_excel as V

ELEMENT_DEFS = """DatasetName|ElementNumber|ElementName|Code|CodeDescription
EMSDataSet|eVitals.06|SPO2 Qualifier|7701|Not Applicable
EMSDataSet|ePatient.15| Age Units |2516009| Years
"""

FIELD_DEFS = """Dataset|DatasetType|ElementNumber|ElementName|Attribute
EMSDataSet|EMS|eVitals.06|Pulse Oximetry|NV
"""


@pytest.fixture()
def defs_file(tmp_path):
    p = tmp_path / "ElementDefinitions.txt"
    p.write_text(ELEMENT_DEFS)
    return str(p)


def test_load_element_definitions(spark, defs_file):
    df = DF.load_element_definitions(spark, defs_file)
    assert df.columns == DF.ELEMENT_DEFINITIONS_COLUMNS
    rows = {r["Code"]: r for r in df.collect()}
    assert rows["7701"]["CodeDescription"] == "Not Applicable"
    # fields trimmed (reference strips every field)
    assert rows["2516009"]["ElementName"] == "Age Units"
    assert rows["2516009"]["CodeDescription"] == "Years"


def test_load_field_definitions(spark, tmp_path):
    p = tmp_path / "FieldDefinitions.txt"
    p.write_text(FIELD_DEFS)
    df = DF.load_field_definitions(spark, str(p))
    assert df.collect()[0]["Attribute"] == "NV"


def test_missing_columns_raises(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("A|B\n1|2\n")
    with pytest.raises(ValueError, match="missing columns"):
        DF.load_element_definitions(spark, str(p))


def test_decode_join(spark, defs_file):
    dims = DF.load_element_definitions(spark, defs_file)
    fact = spark.createDataFrame(
        [("r1", "7701"), ("r2", "9999")], "id string, evitals_06_value string"
    )
    out = DF.decode_join(fact, dims, "evitals_06_value")
    rows = {r["id"]: r["evitals_06_value_description"] for r in out.collect()}
    assert rows["r1"] == "Not Applicable"
    assert rows["r2"] is None  # left join keeps undecodable values


def test_vendor_frame_from_pandas(spark):
    pdf = pd.DataFrame(
        {
            "Code": ["1", None, None],
            "Value": ["a", "b", None],
            "Label": ["x", "y", None],
        }
    )
    df = V.frame_from_pandas(spark, pdf, ["Code", "Value", "Label"])
    rows = df.collect()
    assert len(rows) == 2  # all-null row dropped (dropna how='all')
    assert rows[0]["Code"] == "1"
    assert rows[1]["Code"] is None  # partial nulls preserved
    assert df.schema["Code"].dataType.typeName() == "string"


def test_vendor_unknown_vendor_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="not supported"):
        V.import_vendor_excel(spark, str(tmp_path / "x.xlsx"), "nope", "src")
