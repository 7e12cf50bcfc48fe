"""Identifier/naming parity layer (SURVEY §2.C2, §2.E6, §2.H).

Pure-Python scalar functions whose outputs must be byte-identical to the
reference so the warehouse the Spark engine produces has the same table,
column and constraint names:

* ``sanitize_name``       — parity with /root/reference/xml_handler.py:10-19
* ``value_column_name``   — parity with /root/reference/xml_handler.py:91
* ``table_name_for_tag``  — lowercase naming, /root/reference/main_ingest.py:203-208
* ``fk_constraint_name``  — 63-char hash-truncation,
                            /root/reference/main_ingest.py:512-582

These run on the driver (naming layer), never per-row on data, so plain
Python is the right tool — no UDFs needed.  The per-row equivalents used
inside DataFrame plans live in ``functions.text`` as Column expressions.
"""

from __future__ import annotations

import hashlib

MAX_IDENTIFIER_LEN = 63  # PostgreSQL identifier limit the reference targets

COMMON_COLUMNS = (
    "element_id",
    "parent_element_id",
    "pcr_uuid_context",
    "original_tag_name",
)
"""The 4 fixed bookkeeping columns of every dynamic per-tag table; the 5th
common column is the per-table value column (``{table}_value``).  Parity
with /root/reference/main_ingest.py:210-216."""


def sanitize_name(name: str) -> str:
    """SQL-friendly identifier: ``.``→``_``, keep ``[A-Za-z0-9_]`` (by
    ``str.isalnum`` semantics, i.e. unicode alphanumerics survive), prefix
    ``_`` when digit-leading, empty → ``unnamed_element``.

    Behavior parity with the reference sanitizer
    (/root/reference/xml_handler.py:10-19) including its unicode quirk:
    ``isalnum`` keeps non-ASCII letters.
    """
    out = name.replace(".", "_")
    out = "".join(ch for ch in out if ch.isalnum() or ch == "_")
    if out and out[0].isdigit():
        out = "_" + out
    return out or "unnamed_element"


def strip_namespace(tag: str) -> str:
    """``{uri}Tag`` → ``Tag`` (/root/reference/xml_handler.py:59-62,76-79)."""
    if tag.startswith("{"):
        close = tag.find("}")
        if close != -1:
            return tag[close + 1 :]
    return tag


def value_column_name(sanitized_tag: str) -> str:
    """Semantic value column ``{tag}_value`` (/root/reference/xml_handler.py:91)."""
    return f"{sanitized_tag}_value"


def table_name_for_tag(sanitized_tag: str) -> str:
    """Physical table name: lowercased sanitized tag
    (/root/reference/main_ingest.py:203-208)."""
    return sanitized_tag.lower()


def fk_constraint_name(child_table: str, parent_table: str) -> str:
    """Foreign-key constraint name with the reference's 63-char truncation
    scheme (/root/reference/main_ingest.py:512-582): the ideal name
    ``fk_{child}_{parent}`` is used verbatim when it fits; otherwise both
    table parts are truncated toward an even split and a 6-hex-char MD5 of
    the *ideal* name is appended, keeping the result ≤63 chars.
    """
    ideal = f"fk_{child_table}_{parent_table}"
    if len(ideal) <= MAX_IDENTIFIER_LEN:
        return ideal

    hash_suffix = hashlib.md5(ideal.encode()).hexdigest()[:6]
    # budget for "child_parent" once prefix, "_", and hash are reserved
    budget = MAX_IDENTIFIER_LEN - len("fk_") - len(hash_suffix) - 1

    child, parent = child_table, parent_table
    if len(child) + 1 + len(parent) > budget:
        names_budget = budget - 1  # the underscore between child and parent
        max_child = names_budget // 2
        max_parent = names_budget - max_child
        if len(child) > max_child:
            child = child[:max_child]
            max_parent = names_budget - len(child)
        if len(parent) > max_parent:
            parent = parent[:max_parent]
        if len(child) + 1 + len(parent) > names_budget:
            child = child[: names_budget - len(parent) - 1]

    name = f"fk_{child}_{parent}_{hash_suffix}"
    return name[:MAX_IDENTIFIER_LEN]


def vendor_table_name(source: str, sheet_name: str) -> str:
    """``{source}_{sheet}`` with spaces/dots→underscores, lowercased
    (/root/reference/vendor_import.py:223-225)."""
    sheet = sheet_name.replace(" ", "_").replace(".", "_").lower()
    return f"{source.lower()}_{sheet}"
