"""Naming parity (SURVEY §5.1): sanitizer, value column, FK truncation.

Expected values follow the reference semantics documented in SURVEY §2.C2 /
§2.E6 (xml_handler.py:10-19, main_ingest.py:512-582)."""

from nemsis_xml_parser_spark import naming


def test_sanitize_dots():
    assert naming.sanitize_name("eVitals.01") == "eVitals_01"


def test_sanitize_specials_dropped():
    assert naming.sanitize_name("a-b c/d'e") == "abcde"


def test_sanitize_digit_leading():
    assert naming.sanitize_name("1Bad.Tag") == "_1Bad_Tag"


def test_sanitize_empty_fallback():
    assert naming.sanitize_name("") == "unnamed_element"
    assert naming.sanitize_name("!!!") == "unnamed_element"


def test_sanitize_unicode_kept():
    # str.isalnum keeps unicode letters — documented reference quirk
    assert naming.sanitize_name("é.tag") == "é_tag"


def test_strip_namespace():
    assert naming.strip_namespace("{http://www.nemsis.org}eVitals.01") == "eVitals.01"
    assert naming.strip_namespace("plain") == "plain"


def test_value_column_and_table_name():
    assert naming.value_column_name("evitals_01") == "evitals_01_value"
    assert naming.table_name_for_tag("eVitals_01") == "evitals_01"


def test_fk_name_short():
    assert naming.fk_constraint_name("child", "parent") == "fk_child_parent"


def test_fk_name_truncated_63():
    child = "a" * 50
    parent = "b" * 50
    name = naming.fk_constraint_name(child, parent)
    assert len(name) <= 63
    assert name.startswith("fk_")
    # balanced split: both parts truncated, 6-hex hash suffix
    assert name.count("_") >= 3
    suffix = name.rsplit("_", 1)[1]
    assert len(suffix) == 6
    int(suffix, 16)  # hex


def test_fk_name_asymmetric_truncation():
    # short parent keeps its full name; child absorbs the cut
    child = "c" * 80
    parent = "p" * 10
    name = naming.fk_constraint_name(child, parent)
    assert len(name) <= 63
    assert "p" * 10 in name


def test_fk_name_deterministic():
    a = naming.fk_constraint_name("x" * 70, "y" * 70)
    b = naming.fk_constraint_name("x" * 70, "y" * 70)
    assert a == b


def test_vendor_table_name():
    assert (
        naming.vendor_table_name("Src", "Procedure (eProcedures.03)")
        == "src_procedure_(eprocedures_03)"
    )
