"""Corpus snapshot diff (operators/corpusdiff.py)."""

from __future__ import annotations

from ffi_export_etl_spark.operators.corpusdiff import (
    corpus_diff,
    corpus_diff_counts,
)


def test_statuses_known_answer(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "e")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, ""), (6, "f")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "changed",   # NULL -> '' is a CHANGE, not unchanged
        5: "removed",
        6: "added",
    }
    counts = {
        r["status"]: (r["n_docs"], r["min_id"], r["max_id"])
        for r in corpus_diff_counts(old, new).collect()
    }
    assert counts["removed"] == (2, 3, 5)
    assert counts["added"] == (1, 6, 6)


def test_identical_and_disjoint(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    assert {
        r["status"] for r in corpus_diff(a, a).collect()
    } == {"unchanged"}
    b = spark.createDataFrame([(9, "z")], "doc_id long, text string")
    got = {r["id"]: r["status"] for r in corpus_diff(a, b).collect()}
    assert got == {1: "removed", 2: "removed", 9: "added"}


def test_diff_cli(spark, tmp_path, capsys):
    import json

    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "doc_id long, text string"
    )
    po, pn = str(tmp_path / "o"), str(tmp_path / "n")
    old.write.parquet(po)
    new.write.parquet(pn)

    from ffi_export_etl_spark.__main__ import main

    rc = main(["diff", "--old", po, "--new", pn])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["unchanged"]["n_docs"] == 1
    assert rep["changed"]["n_docs"] == 1
    assert rep["added"] == {"n_docs": 1, "min_id": 3, "max_id": 3}
    assert rep["removed"]["n_docs"] == 0
