"""Recursive XML tree flatten → canonical elements DataFrame.

Reference behavior: ``_traverse_element_recursive``
(/root/reference/xml_handler.py:22-115) + ``parse_xml_file``
(/root/reference/xml_handler.py:118-141).  Spark SQL has no unbounded
recursion, so the flatten runs inside ``mapInPandas`` over
``binaryFile``-scanned documents — each task parses its files and emits
fixed-schema element rows; everything downstream is pure Catalyst.

Scale design: one XML document is one row of the binaryFile scan, so a
100 TB corpus of NEMSIS files parallelizes per-file across executors with
no shuffle at all (narrow map).  The flatten is iterative (explicit stack),
so tree depth is bounded by memory, not Python's recursion limit.

Semantics parity checklist (tests/test_flatten.py):
* namespace strip on tags and attribute keys (xml_handler.py:59-62,76-79)
* identifier sanitize incl. unicode + digit-leading (xml_handler.py:10-19)
* ``text.strip() if text else None`` — whitespace-only text → ``''``,
  absent text → NULL (xml_handler.py:100)
* PCR UUID fill-down to all descendants; UUID injected into the
  PatientCareReport's own attributes when absent (xml_handler.py:83-88)
* parent links + parent table suggestion (xml_handler.py:95,103,107-115)
* malformed XML → zero rows for that file (xml_handler.py:132-134)
"""

from __future__ import annotations

import hashlib
import uuid
import xml.etree.ElementTree as ET
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..naming import sanitize_name, strip_namespace
from ..schema import ELEMENT_SCHEMA

_COLUMNS = [f.name for f in ELEMENT_SCHEMA.fields]


def _new_element_id(deterministic_seed: str | None, idx: int) -> str:
    if deterministic_seed is None:
        return str(uuid.uuid4())
    # UUID shaped from md5(file || preorder index): stable across re-ingest,
    # used by tests and by idempotent pipelines.
    digest = hashlib.md5(f"{deterministic_seed}#{idx}".encode()).hexdigest()
    return str(uuid.UUID(digest))


def flatten_xml_document(
    data: bytes | str,
    file_name: str | None = None,
    deterministic_ids: bool = False,
) -> list[dict]:
    """Flatten one XML document into canonical element-row dicts.

    Iterative preorder DFS with an explicit stack — same visit order and
    per-element fields as the reference's recursion
    (/root/reference/xml_handler.py:22-115), plus path/depth/preorder/file.
    Malformed XML → ``[]`` (xml_handler.py:132-134).
    """
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []

    seed = file_name if deterministic_ids else None
    rows: list[dict] = []
    # stack entries: (element, parent_id, pcr_uuid, path_parts, parent_table, depth)
    stack: list[tuple] = [(root, None, None, (), None, 0)]
    idx = 0
    while stack:
        element, parent_id, pcr_uuid, path_parts, parent_table, depth = stack.pop()
        element_id = _new_element_id(seed, idx)

        raw_tag = element.tag
        local_tag = strip_namespace(raw_tag)
        sanitized_tag = sanitize_name(local_tag)
        cur_path = path_parts + (sanitized_tag,)

        attributes = {
            sanitize_name(strip_namespace(k)): v for k, v in element.attrib.items()
        }
        # PCR UUID capture + fill-down + self-attribute injection
        # (xml_handler.py:83-88)
        if local_tag == "PatientCareReport" and element.get("UUID"):
            pcr_uuid = element.get("UUID")
            attributes.setdefault(sanitize_name("UUID"), pcr_uuid)

        rows.append(
            {
                "element_id": element_id,
                "parent_element_id": parent_id,
                "element_tag": local_tag,
                "full_xmlns_tag": raw_tag,
                "table_name": sanitized_tag,
                "attributes": attributes,
                "value": element.text.strip() if element.text else None,
                "pcr_uuid": pcr_uuid,
                "parent_table_name": parent_table,
                "path": "/".join(cur_path),
                "depth": depth,
                "pre_order_idx": idx,
                "file": file_name,
            }
        )
        idx += 1
        # push children reversed so pop() visits them in document order
        for child in reversed(list(element)):
            stack.append((child, element_id, pcr_uuid, cur_path, sanitized_tag, depth + 1))
    return rows


def _flatten_partition(
    batches: Iterator[pd.DataFrame], deterministic_ids: bool
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: list[dict] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            out.extend(
                flatten_xml_document(
                    bytes(content), file_name=path, deterministic_ids=deterministic_ids
                )
            )
        if out:
            yield pd.DataFrame(out, columns=_COLUMNS)


def flatten_xml_files(
    spark: SparkSession,
    path: str | Iterable[str],
    deterministic_ids: bool = False,
) -> DataFrame:
    """Distributed flatten: binaryFile scan (SURVEY A1/A5) → per-file parse
    (A2) → canonical elements DataFrame.  Narrow map — no shuffle.
    """
    paths = [path] if isinstance(path, str) else list(path)
    binary = spark.read.format("binaryFile").load(paths).select("path", "content")
    return binary.mapInPandas(
        lambda it: _flatten_partition(it, deterministic_ids), schema=ELEMENT_SCHEMA
    )


def flatten_xml_strings(
    spark: SparkSession,
    docs: list[tuple[str, str]],
    deterministic_ids: bool = True,
) -> DataFrame:
    """Flatten in-memory (name, xml_text) docs — the test/fixture path."""
    rows: list[dict] = []
    for name, text in docs:
        rows.extend(
            flatten_xml_document(text, file_name=name, deterministic_ids=deterministic_ids)
        )
    return spark.createDataFrame(rows, schema=ELEMENT_SCHEMA)
