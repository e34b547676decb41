"""JSONL source: PERMISSIVE parse + required-column quarantine contract
(sources/jsonl.py)."""

from __future__ import annotations

import gzip
import json

import pytest

from ffi_export_etl_spark.sources.jsonl import (
    DOCUMENTS_JSONL_SCHEMA,
    read_documents_jsonl,
    read_jsonl,
)

GOOD = [
    {"doc_id": 1, "url": "http://a.example/x", "source": "web",
     "lang": "en", "text": "hello world"},
    {"doc_id": 2, "url": None, "source": "books", "lang": "de",
     "text": "guten tag"},
    # extra keys are ignored (forward-compatible arrival contract)
    {"doc_id": 3, "text": "minimal row", "unexpected_key": [1, 2, 3]},
]
MALFORMED = [
    '{"doc_id": 4, "text": "truncated',          # unterminated string
    '{"doc_id": 5 "text": "missing comma"}',     # syntax error
    "not json at all",
]
DRIFT = [
    {"doc_id": 6},                                # text missing
    {"url": "http://b.example/", "text": "no id"},  # doc_id missing
]


def _write(tmp_path, name, lines, gz=False):
    p = tmp_path / name
    data = "\n".join(lines) + "\n"
    if gz:
        p.write_bytes(gzip.compress(data.encode()))
    else:
        p.write_text(data)
    return str(p)


@pytest.fixture()
def corpus_path(tmp_path):
    lines = [json.dumps(r) for r in GOOD] + MALFORMED + [
        json.dumps(r) for r in DRIFT
    ]
    return _write(tmp_path, "docs.jsonl", lines)


def test_clean_rows_carry_declared_schema(spark, corpus_path):
    clean, _ = read_documents_jsonl(spark, corpus_path)
    assert clean.columns == ["doc_id", "url", "source", "lang", "text"]
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "hello world"
    assert rows[2]["url"] is None          # optional null passes
    assert rows[3]["source"] is None       # absent optional -> null


def test_quarantine_reasons_and_raw_replay(spark, corpus_path):
    _, quarantine = read_documents_jsonl(spark, corpus_path)
    rows = quarantine.collect()
    by_reason: dict[str, list[str]] = {}
    for r in rows:
        by_reason.setdefault(r["reason"], []).append(r["raw"])
    assert len(by_reason["malformed_json"]) == len(MALFORMED)
    # the raw offending line is preserved verbatim for malformed rows
    assert set(by_reason["malformed_json"]) == set(MALFORMED)
    # drift rows reconstruct a replayable JSON view of what parsed
    assert len(by_reason["missing_required"]) == len(DRIFT)
    for raw in by_reason["missing_required"]:
        json.loads(raw)  # must itself be valid JSON


def test_clean_plus_quarantine_partition_the_input(spark, corpus_path):
    clean, quarantine = read_documents_jsonl(spark, corpus_path)
    total = len(GOOD) + len(MALFORMED) + len(DRIFT)
    assert clean.count() + quarantine.count() == total


def test_gz_segments_and_glob(spark, tmp_path):
    _write(tmp_path, "part-0.jsonl.gz",
           [json.dumps(GOOD[0]), MALFORMED[0]], gz=True)
    _write(tmp_path, "part-1.jsonl.gz", [json.dumps(GOOD[1])], gz=True)
    clean, quarantine = read_documents_jsonl(
        spark, str(tmp_path / "part-*.jsonl.gz")
    )
    assert clean.count() == 2
    assert quarantine.count() == 1


def test_no_required_columns_contract(spark, tmp_path):
    """required=() is valid: quarantine malformed JSON only, drift rows
    all count as clean."""
    p = _write(
        tmp_path, "docs.jsonl",
        [json.dumps(r) for r in GOOD + DRIFT] + MALFORMED,
    )
    clean, quarantine = read_jsonl(
        spark, p, DOCUMENTS_JSONL_SCHEMA, required=()
    )
    assert clean.count() == len(GOOD) + len(DRIFT)
    assert quarantine.count() == len(MALFORMED)


def test_schema_must_carry_corrupt_column(spark, tmp_path):
    import pyspark.sql.types as T

    bad = T.StructType([T.StructField("doc_id", T.LongType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(tmp_path), bad, required=("doc_id",))


def test_all_clean_and_all_bad_edges(spark, tmp_path):
    p_good = _write(tmp_path, "good.jsonl", [json.dumps(r) for r in GOOD])
    clean, quarantine = read_documents_jsonl(spark, p_good)
    assert quarantine.count() == 0 and clean.count() == len(GOOD)

    p_bad = _write(tmp_path, "bad.jsonl", MALFORMED)
    clean, quarantine = read_documents_jsonl(spark, p_bad)
    assert clean.count() == 0 and quarantine.count() == len(MALFORMED)


def test_documents_schema_matches_parquet_corpus(spark, sf_oracle):
    """The JSONL arrival schema round-trips into the same shape the rest
    of the engine consumes: dump a slice of the parquet documents table
    to JSONL, read it back, and the clean side must agree row-for-row."""
    from ffi_export_etl_spark.sources.parquet import load_table

    d = load_table(spark, sf_oracle, "documents").limit(50)
    want = {
        (r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()
    }
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dump.jsonl")
        with open(path, "w") as f:
            for r in d.collect():
                f.write(json.dumps({
                    "doc_id": r["doc_id"], "text": r["text"],
                    "source": r["source"] if "source" in d.columns else None,
                }) + "\n")
        clean, quarantine = read_documents_jsonl(spark, path)
        got = {
            (r["doc_id"], r["text"])
            for r in clean.select("doc_id", "text").collect()
        }
        assert got == want
        assert quarantine.count() == 0
