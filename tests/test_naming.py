"""Driver-side naming helpers (reference F4/F5, functions.py:28-69)."""

from ffi_export_etl_spark.functions.naming import (
    normalize_columns,
    normalize_string,
    parse_camelcase,
)


def test_parse_camelcase():
    assert parse_camelcase("MacroPlot") == "macro_plot"
    assert parse_camelcase("ABCWord") == "abc_word"
    assert parse_camelcase("myXMLFile") == "my_xml_file"
    assert parse_camelcase("already_snake") == "already_snake"


def test_normalize_string():
    assert normalize_string("Trees - Saplings (Diameter Class)") == "trees_saplings"
    assert normalize_string("Surface Fuels - Fine") == "surface_fuels_fine"
    assert normalize_string("A.B-C D") == "abcd"


def test_normalize_columns():
    got = normalize_columns(["MacroPlot_GUID", "DD_Lat"])
    assert got == {"MacroPlot_GUID": "macro_plot_guid", "DD_Lat": "dd_lat"}
