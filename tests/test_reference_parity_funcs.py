"""Scalar-function parity vs a Python re-expression of the REFERENCE
semantics (SURVEY.md section 5.2c): many generated + edge-case inputs go
through Spark Column exprs in one job and are compared value-by-value to
the reference logic executed in plain Python.

The Python oracles below transcribe the reference's documented BEHAVIOR
(delimiter-choice rules parser/xml.py:375-395, ident normalization
xml.py:151-177, VisitID branches xml.py:529-547) with the engine's
documented divergences applied (sorted team order Q9, '' for NaN prefix).
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from ffi_export_etl_spark.functions.idents import (
    combine_teams,
    event_id,
    normalize_ident,
    parse_list_val,
    plot_id,
)
from ffi_export_etl_spark.sources.jdbc import build_metas, jdbc_url


# ---- Python oracles (reference semantics) --------------------------------

def py_parse_list_val(val: str | None) -> list[str]:
    if val is None or str(val) in ("nan", "", " "):
        return []
    comma = val.split(",")
    space = val.split(" ")
    slash = val.split("/")
    if len(comma) > 1:
        chosen = comma
    elif len(space) > 1:
        chosen = space
    elif len(slash) > 1:
        chosen = slash
    else:
        chosen = comma
    return [x.strip() for x in chosen if x.strip() != ""]


def py_combine(vals: list[str | None]) -> str:
    items: set[str] = set()
    for v in vals:
        items.update(py_parse_list_val(v))
    return ", ".join(sorted(items))


def py_normalize_ident(s: str) -> str:
    return s.replace(" ", "").replace("_", "").replace("-", "").replace(
        ".", ""
    ).upper()


def py_plot_id(admin: str, plot: str) -> str:
    return py_normalize_ident(admin)[:5] + py_normalize_ident(plot)


def py_event_id(pid: str, date: str) -> str:
    if not pid:
        return ""
    m = re.findall(r"(\d{4}-\d{2}-\d{2})", date or "")
    return pid + m[0].replace("-", "") if m else ""


# ---- generated corpora ---------------------------------------------------

rng = random.Random(42)
NAMES = ["Al", "Bo Chen", "Cy", "D'Arcy", "Eve Li", "F G H"]


def _personnel_case() -> str:
    sep = rng.choice([", ", ",", " ", "/", " / "])
    k = rng.randint(1, 4)
    return sep.join(rng.choice(NAMES) for _ in range(k))


PERSONNEL = (
    [_personnel_case() for _ in range(60)]
    + ["", " ", "nan", None, "solo", "a,b,c", "a b c", "a/b/c", "a, b/c",
       " spaced , out ", ",", "/", "  "]
)

IDENT_CASES = [
    ("North Rim Unit", "Plot-1"),
    ("a_b-c.d e", "X_Y.Z"),
    ("tiny", "p"),
    ("LONGNAMEUNIT", "PLOT  22"),
]


# ---- tests ---------------------------------------------------------------

def test_parse_list_val_matches_reference(spark):
    df = spark.createDataFrame([(v,) for v in PERSONNEL], "v string")
    got = [r[0] for r in df.select(parse_list_val("v").alias("x")).collect()]
    want = [py_parse_list_val(v) for v in PERSONNEL]
    assert got == want


def test_combine_teams_matches_reference(spark):
    pairs = [
        (PERSONNEL[i], PERSONNEL[(i * 7 + 3) % len(PERSONNEL)])
        for i in range(len(PERSONNEL))
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r[0] for r in df.select(combine_teams("a", "b").alias("t")).collect()]
    want = [py_combine([a, b]) for a, b in pairs]
    assert got == want


def test_ident_synthesis_matches_reference(spark):
    df = spark.createDataFrame(IDENT_CASES, "admin string, plot string")
    got = [
        r[0]
        for r in df.select(plot_id("admin", "plot").alias("p")).collect()
    ]
    want = [py_plot_id(a, p) for a, p in IDENT_CASES]
    assert got == want
    # event ids incl. missing-plot and unparseable-date paths
    ev_cases = [
        ("NORTHPLOT1", "2023-05-15 10:00:00"),
        ("", "2023-05-15"),
        ("P2", "not a date"),
    ]
    df2 = spark.createDataFrame(ev_cases, "pid string, d string")
    got2 = [
        r[0]
        for r in df2.select(
            event_id(F.col("pid"), F.col("d")).alias("e")
        ).collect()
    ]
    assert got2 == [py_event_id(p, d) for p, d in ev_cases]


def test_normalize_ident_column(spark):
    df = spark.createDataFrame([(a,) for a, _ in IDENT_CASES], "s string")
    got = [r[0] for r in df.select(normalize_ident("s").alias("n")).collect()]
    assert got == [py_normalize_ident(a) for a, _ in IDENT_CASES]


def test_jdbc_url_builder():
    assert (
        jdbc_url("mssql", "db.example", "FFI", Encrypt="yes")
        == "jdbc:sqlserver://db.example:1433;databaseName=FFI;Encrypt=yes"
    )
    assert (
        jdbc_url("postgres", "pg.example", "ffi", sslmode="require")
        == "jdbc:postgresql://pg.example:5432/ffi?sslmode=require"
    )


def test_build_metas_orders_pk_and_collects_fks():
    metas = build_metas(
        pk_rows=[("Plot", "B", 2), ("Plot", "A", 1), ("Event", "EventID", 1)],
        fk_rows=[("Event", "PlotID", "Plot", "A")],
    )
    assert metas["Plot"].primary_key == ["A", "B"]
    assert metas["Event"].foreign_keys == {"PlotID": [("Plot", "A")]}
