"""sequence_manifest (operators/packing.py): the data-loader view of a
packed corpus — slices must tile every sequence exactly and reassemble
the original token stream."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ffi_export_etl_spark.operators.packing import (
    pack_sequences,
    sequence_manifest,
)

CAPACITY = 7


def _manifest(spark, texts, capacity=CAPACITY, block_size=3):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    packed = pack_sequences(docs, capacity=capacity, block_size=block_size)
    return sequence_manifest(packed, capacity).collect()


def _check_tiling(rows, total_tokens, capacity):
    """Slices per sequence are consecutive from 0 and fill to capacity
    (final sequence may be short); per doc they cover [0, n_doc)."""
    by_seq: dict[int, list] = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    n_seqs = -(-total_tokens // capacity)
    assert set(by_seq) == set(range(n_seqs))
    for s, slices in by_seq.items():
        slices.sort(key=lambda r: r["seq_tok_start"])
        pos = 0
        for r in slices:
            assert r["seq_tok_start"] == pos and r["n_toks"] > 0
            pos += r["n_toks"]
        want = capacity if s < n_seqs - 1 else total_tokens - s * capacity
        assert pos == want, (s, pos, want)


def test_known_answer(spark):
    # token counts (whitespace split): 3, 5, 2, 4 -> stream of 14 tokens,
    # capacity 7 -> seqs: [d0(3) d1(4/5)] [d1(1/5) d2(2) d3(4)]
    texts = ["a b c", "d e f g h", "i j", "k l m n"]
    rows = _manifest(spark, texts)
    got = {
        (r["seq_id"], r["id"], r["doc_tok_start"], r["seq_tok_start"],
         r["n_toks"])
        for r in rows
    }
    assert got == {
        (0, 0, 0, 0, 3),
        (0, 1, 0, 3, 4),
        (1, 1, 4, 0, 1),
        (1, 2, 0, 1, 2),
        (1, 3, 0, 3, 4),
    }
    _check_tiling(rows, 14, CAPACITY)


def test_reassembly_equals_concatenation(spark):
    texts = ["a b c", "d e f g h", "i j", "k l m n", "o", "p q r s t u v w"]
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    stream = [tok for i in sorted(toks) for tok in toks[i]]
    rows = _manifest(spark, texts)
    rebuilt: dict[int, dict[int, str]] = {}
    for r in rows:
        seq = rebuilt.setdefault(r["seq_id"], {})
        for k in range(r["n_toks"]):
            seq[r["seq_tok_start"] + k] = toks[r["id"]][r["doc_tok_start"] + k]
    flat = []
    for s in sorted(rebuilt):
        seq = rebuilt[s]
        flat.extend(seq[p] for p in sorted(seq))
    assert flat == stream


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=1, max_value=19), min_size=1,
                max_size=30))
def test_tiling_property(spark, lengths):
    texts = ["w " * (n - 1) + "w" for n in lengths]
    rows = _manifest(spark, texts, capacity=CAPACITY, block_size=4)
    _check_tiling(rows, sum(lengths), CAPACITY)
