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


def _vendor_workbook(path):
    """Real .xlsx bytes (stdlib writer) matching the imagetrend spec:
    extra columns to prove usecols projection, an all-null data row, mixed
    numeric/string cells, plus an unconfigured sheet that must be ignored."""
    from nemsis_xml_parser_spark.sources.xlsx_lite import write_xlsx

    write_xlsx(
        str(path),
        {
            "DataSetFields": [
                ["Field Code", "Field Name", "Default Label", "Data Type",
                 "Active", "Specific Module", "IgnoredExtra"],
                ["F1", "Incident Number", "Incident #", "Text", True, "EMS", "zzz"],
                [None, None, None, None, None, None, None],
                [42, "Unit Call Sign", None, "Text", False, None, "zzz"],
            ],
            "Procedure (eProcedures.03)": [
                ["Code", "Value", "Label", "Sort Order", "Resource Type"],
                [89, "Airway", "Airway - Oral", 1.5, "ALS"],
            ],
            "NotConfigured": [["A"], ["x"]],
        },
    )


def test_import_vendor_excel_real_workbook(spark, tmp_path):
    wb = tmp_path / "imagetrend.xlsx"
    _vendor_workbook(wb)
    out = V.import_vendor_excel(
        spark, str(wb), "imagetrend", "it", write_dir=str(tmp_path / "lake")
    )
    assert set(out) == {"it_datasetfields", "it_procedure_(eprocedures_03)"}
    fields = out["it_datasetfields"].collect()
    # all-null row dropped; usecols projected (IgnoredExtra gone); every
    # cell stringified with NULL preserved — vendor_import.py:222-237 parity
    assert len(fields) == 2
    assert out["it_datasetfields"].columns == [
        "Field Code", "Field Name", "Default Label", "Data Type",
        "Active", "Specific Module",
    ]
    assert fields[0]["Field Code"] == "F1"
    assert fields[0]["Active"] == "True"
    assert fields[1]["Field Code"] == "42"
    assert fields[1]["Default Label"] is None
    proc = out["it_procedure_(eprocedures_03)"].collect()
    assert proc[0]["Code"] == "89"
    assert proc[0]["Sort Order"] == "1.5"
    # parquet landed
    assert (tmp_path / "lake" / "it_datasetfields").exists()


def test_xlsx_lite_reader_features(tmp_path):
    from nemsis_xml_parser_spark.sources import xlsx_lite as X

    wb = tmp_path / "t.xlsx"
    X.write_xlsx(str(wb), {"S1": [["H1", "H2"], ["a", 1], [None, 2.25]]})
    pdf = X.read_xlsx(str(wb), "S1")
    assert list(pdf.columns) == ["H1", "H2"]
    assert pdf["H2"].tolist() == [1, 2.25]
    assert pdf["H1"].tolist()[1] is None
    with pytest.raises(ValueError, match="Worksheet named"):
        X.read_xlsx(str(wb), "missing")
    with pytest.raises(KeyError, match="usecols"):
        X.read_xlsx(str(wb), "S1", usecols=["H1", "nope"])
    with pytest.raises(ValueError, match="invalid sheet name"):
        X.write_xlsx(str(wb), {"bad[name]": [["A"]]})
