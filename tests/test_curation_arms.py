"""The r6 cur_pack arms (queries/curation_q.py): the frozen zlib
test-vector literals stay honest against live stdlib zlib, the URL arm's
constructed-variant collapse, and the qmfeat micro-unit payload against
operators/quality_model.quality_features directly. Full gate parity at
sf0.01 rides in tests/test_queries_oracle.py like every registry row."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from ffi_export_etl_spark.queries.curation_q import (
    _COMP_EXPECTED,
    _COMP_VECTORS,
    _URL_MOD,
    _compvec_arm,
    _qmfeat_arm,
    _url_arm,
)


def test_comp_expected_literals_match_live_zlib():
    """The oracle's frozen (raw, compressed) sizes ARE stdlib zlib at
    the kernel's level 6 — if zlib or the vectors ever change, this
    fails before the gate can compare a stale literal."""
    assert set(_COMP_EXPECTED) == {vid for vid, _ in _COMP_VECTORS}
    for vid, text in _COMP_VECTORS:
        b = text.encode("utf-8")
        assert _COMP_EXPECTED[vid] == (len(b), len(zlib.compress(b, 6))), vid


def test_compvec_arm_values(spark):
    rows = {r["id"]: r for r in _compvec_arm(spark).collect()}
    for vid, (raw, comp) in _COMP_EXPECTED.items():
        assert rows[vid]["payload"] == f"{raw}:{comp}"
        expect = (comp / raw) if raw else 0.0
        assert rows[vid]["qscale"] == expect


def test_url_arm_keeper_and_passthrough(spark):
    """Per group of _URL_MOD consecutive ids: the four URL spellings of
    one resource collapse to the min-id keeper with the expected
    canonical string; mailto/free-text variants all pass through."""
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    ).withColumn("text", F.lit("x"))
    out = {r["id"]: r["payload"] for r in _url_arm(docs).collect()}
    assert sorted(out) == [0, 4, 5, 6, 10, 11]
    assert out[0] == "http://site0.com/p/0?a=1&b=2"
    assert out[6] == "http://site1.com/p/1?a=1&b=2"
    assert out[4] == "mailto:user@site0.com"
    assert out[5] == "not a url 0"
    assert _URL_MOD == 6


def test_qmfeat_payload_matches_features(spark, sf_small):
    """The micro-unit payload is round(f * 1e6) of quality_features'
    own output, column for column."""
    from ffi_export_etl_spark.operators.quality_model import (
        FEATURE_COLS,
        quality_features,
    )
    from ffi_export_etl_spark.sources.parquet import load_table

    docs = load_table(spark, sf_small, "documents").limit(50)
    feats = {r["id"]: r for r in quality_features(docs).collect()}
    arm = {r["id"]: r["payload"] for r in _qmfeat_arm(docs).collect()}
    assert set(arm) == set(feats)
    from decimal import ROUND_HALF_UP, Decimal

    def half_up(x: float) -> int:
        # Spark F.round is HALF_UP on the double value; Python round()
        # is banker's — Decimal over the exact binary double matches
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    for i, payload in arm.items():
        got = [int(x) for x in payload.split(",")]
        expect = [half_up(feats[i][c] * 1_000_000) for c in FEATURE_COLS]
        assert got == expect, i
