"""NEMSIS data-dictionary dimension loaders (SURVEY A3/B6/F2).

Reference behavior (/root/reference/create_definitions.py): HTTP GET two
pipe-delimited exports from nemsis.org, strip every field, full-refresh two
all-TEXT dimension tables:

* ``ElementDefinitions(DatasetName|ElementNumber|ElementName|Code|CodeDescription)``
* ``FieldDefinitions(Dataset|DatasetType|ElementNumber|ElementName|Attribute)``

Spark-first: ``spark.read.csv(sep='|', header=True)`` + ``F.trim`` on all
columns + ``mode('overwrite')`` write — replacing the reference's DELETE +
row-at-a-time INSERT loop (create_definitions.py:54-63).  The HTTP download
stays driver-side (dimension-sized data); network access is injectable so
tests run offline from local fixture files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Endpoints verbatim from the reference (create_definitions.py:5-6):
# the pipe-delimited DEMEMS ancillary exports for release 3.5.1.
ELEMENT_DEFINITIONS_URL = (
    "https://nemsis.org/media/nemsis_v3/release-3.5.1/DataDictionary/"
    "Ancillary/DEMEMS/Combined_ElementEnumerations.txt"
)
FIELD_DEFINITIONS_URL = (
    "https://nemsis.org/media/nemsis_v3/release-3.5.1/DataDictionary/"
    "Ancillary/DEMEMS/Combined_ElementAttributes.txt"
)

ELEMENT_DEFINITIONS_COLUMNS = [
    "DatasetName",
    "ElementNumber",
    "ElementName",
    "Code",
    "CodeDescription",
]
FIELD_DEFINITIONS_COLUMNS = [
    "Dataset",
    "DatasetType",
    "ElementNumber",
    "ElementName",
    "Attribute",
]


def read_pipe_delimited(
    spark: SparkSession, path: str, expected_columns: list[str]
) -> DataFrame:
    """Pipe-delimited scan with header; every field trimmed, all STRING
    (parity: create_definitions.py:42-52 strips each field; all-TEXT §1.3)."""
    df = (
        spark.read.option("sep", "|")
        .option("header", "true")
        .option("inferSchema", "false")
        .csv(path)
    )
    missing = [c for c in expected_columns if c not in df.columns]
    if missing:
        raise ValueError(f"definitions file {path} missing columns: {missing}")
    return df.select([F.trim(F.col(c)).alias(c) for c in expected_columns])


def load_element_definitions(spark: SparkSession, path: str) -> DataFrame:
    return read_pipe_delimited(spark, path, ELEMENT_DEFINITIONS_COLUMNS)


def load_field_definitions(spark: SparkSession, path: str) -> DataFrame:
    return read_pipe_delimited(spark, path, FIELD_DEFINITIONS_COLUMNS)


def download_definitions(url: str, dest_path: str) -> str:
    """Driver-side fetch of a definitions export (EP2).  Gated behind an
    import-try so offline environments use local files."""
    import urllib.request

    urllib.request.urlretrieve(url, dest_path)  # noqa: S310
    return dest_path


def decode_join(
    fact: DataFrame,
    element_definitions: DataFrame,
    value_col: str,
    element_number: str | None = None,
) -> DataFrame:
    """The warehouse's designed decode join (SURVEY F2): fact values decoded
    against the broadcast dimension's Code → CodeDescription."""
    dims = element_definitions
    if element_number is not None:
        dims = dims.where(F.col("ElementNumber") == element_number)
    dims = dims.select(
        F.col("Code").alias("__code"),
        F.col("CodeDescription").alias(f"{value_col}_description"),
    )
    return fact.join(
        F.broadcast(dims), fact[value_col] == F.col("__code"), "left"
    ).drop("__code")
