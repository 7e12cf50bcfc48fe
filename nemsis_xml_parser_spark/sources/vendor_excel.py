"""Vendor Excel workbook importer (SURVEY A4/B7, EP3).

Reference behavior (/root/reference/vendor_import.py:6-245): a hardcoded
per-vendor spec of (sheet → usecols); per sheet: read Excel, drop all-null
rows, derive ``{source}_{sheet}`` table name, create all-TEXT table, insert
row-wise.

Spark-first: pandas reads the workbook driver-side (dimension-sized), rows
become a Spark DataFrame with every cell stringified (NULL preserved), and
the sink is one ``mode('overwrite')`` write.  Excel parsing prefers
pandas/openpyxl and falls back to the stdlib-only ``xlsx_lite`` reader
(same sheet-by-name + usecols contract) when no Excel engine is installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..naming import vendor_table_name

# Vendor sheet specs; shape parity with vendor_import.py:6-198 (imagetrend).
VENDOR_SPECS: dict[str, dict[str, dict[str, list[str]]]] = {
    "imagetrend": {
        "sheets": {
            "DataSetFields": [
                "Field Code",
                "Field Name",
                "Default Label",
                "Data Type",
                "Active",
                "Specific Module",
            ],
            "Procedure (eProcedures.03)": [
                "Code",
                "Value",
                "Label",
                "Sort Order",
                "Resource Type",
            ],
        }
    }
}


def frame_from_pandas(spark: SparkSession, pdf, columns: list[str]) -> DataFrame:
    """pandas sheet → all-STRING Spark DataFrame, nulls preserved
    (parity: vendor_import.py:234-237 ``str(v) if pd.notnull(v) else None``),
    all-null rows dropped (vendor_import.py:222)."""
    import pandas as pd

    pdf = pdf[columns].dropna(how="all")
    data = [
        tuple(str(v) if pd.notnull(v) else None for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    schema = StructType([StructField(c, StringType(), True) for c in columns])
    return spark.createDataFrame(data, schema=schema)


def import_vendor_excel(
    spark: SparkSession,
    file_path: str,
    vendor: str,
    source: str,
    write_dir: str | None = None,
) -> dict[str, DataFrame]:
    """EP3 equivalent: {table_name: DataFrame} per configured sheet; when
    ``write_dir`` is given each table is also written as parquet.

    Raises ValueError for unknown vendors (vendor_import.py:216-217) and
    ImportError when no Excel engine is available (stubbed environment)."""
    if vendor not in VENDOR_SPECS:
        raise ValueError(f"Vendor '{vendor}' not supported. Add it to VENDOR_SPECS.")
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise ImportError("pandas required for Excel import") from e

    out: dict[str, DataFrame] = {}
    for sheet, columns in VENDOR_SPECS[vendor]["sheets"].items():
        try:
            pdf = pd.read_excel(file_path, sheet_name=sheet, usecols=columns)
        except ImportError:
            # openpyxl not installed: fall back to the stdlib-only reader,
            # which implements the same sheet-by-name + usecols contract
            from .xlsx_lite import read_xlsx

            pdf = read_xlsx(file_path, sheet_name=sheet, usecols=columns)
        table = vendor_table_name(source, sheet)
        df = frame_from_pandas(spark, pdf, columns)
        if write_dir is not None:
            df.write.mode("overwrite").parquet(f"{write_dir}/{table}")
        out[table] = df
    return out
