"""operators/profile.dataset_card: the corpus datasheet — hand-checked
counts, shares, percentiles, domains, and the CLI + markdown render.
"""

from __future__ import annotations

import json

from ffi_export_etl_spark.operators.profile import (
    dataset_card,
    render_dataset_card,
)


def _docs(spark):
    rows = [
        (1, "one two three four", "web", "http://a.com/x"),
        (2, "one two three four five six", "web", "http://a.com/y"),
        (3, "one two", "web", "http://b.com/z"),
        (4, "alpha beta gamma delta epsilon zeta", "books", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string, url: string"
    )


def test_dataset_card_counts_and_shares(spark):
    card = dataset_card(spark, _docs(spark), url_col="url")
    assert card["n_docs"] == 4
    assert card["n_tokens"] == 4 + 6 + 2 + 6
    assert card["sources"]["web"]["docs"] == 3
    assert card["sources"]["web"]["doc_share"] == 0.75
    assert card["sources"]["books"]["tokens"] == 6
    assert card["sources"]["books"]["token_share"] == round(6 / 18, 6)
    # shares sum to 1 across sources
    assert sum(s["doc_share"] for s in card["sources"].values()) == 1.0
    p10, p50, p90 = card["tokens_per_doc_p10_p50_p90"]
    assert p10 <= p50 <= p90
    assert p10 >= 2 and p90 <= 6
    # domains ordered by count, ties by name; NULL url renders as a row
    # only if extract_domain yields one (it does not for NULL)
    doms = {d["domain"]: d["docs"] for d in card["top_domains"]}
    assert doms["a.com"] == 2 and doms["b.com"] == 1


def test_dataset_card_null_source_text_and_url(spark):
    """The three live-verified review bugs (r8s2): a NULL-source doc
    must not be mistaken for the grand-total row (F.grouping, not
    source IS NULL); all-NULL text cards a source as 0 tokens instead
    of TypeError; NULL/non-URL strings never appear as domains."""
    rows = [
        (1, "a b c", None, None),          # NULL source, NULL url
        (2, "d e", "web", "http://a.com/x"),
        (3, None, "broken", "not a url"),  # NULL text source
    ]
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string, url: string"
    )
    card = dataset_card(spark, docs, url_col="url")
    assert card["n_docs"] == 3             # not the NULL-source subtotal
    assert card["n_tokens"] == 3 + 2 + 0
    assert card["approx_distinct_ids"] == 3
    assert card["sources"]["(null)"]["docs"] == 1
    assert card["sources"]["broken"]["tokens"] == 0
    assert card["sources"]["web"]["doc_share"] == round(1 / 3, 6)
    assert [d["domain"] for d in card["top_domains"]] == ["a.com"]
    # the render survives the null-source key
    assert "| (null) | 1 |" in render_dataset_card(card)


def test_dataset_card_null_sentinel_collision_merges(spark):
    """r8 ADVICE: a corpus containing BOTH NULL-source docs and a
    source literally named '(null)' must merge the two rows
    count-preservingly — one silently overwriting the other mis-states
    the mixture."""
    rows = [
        (1, "a b", None),
        (2, "c d e", "(null)"),
        (3, "f", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string"
    )
    card = dataset_card(spark, docs)
    assert card["n_docs"] == 3
    merged = card["sources"]["(null)"]
    assert merged["docs"] == 2 and merged["tokens"] == 5
    assert merged["doc_share"] == round(2 / 3, 6)
    assert merged["token_share"] == round(5 / 6, 6)
    # shares still sum to 1 after the merge
    assert sum(s["doc_share"] for s in card["sources"].values()) == 1.0


def test_dataset_card_empty_corpus(spark):
    """The empty case is every new partition at scale: zero counts and
    a renderable card, not a next()/int(None)/ZeroDivision traceback."""
    empty = _docs(spark).limit(0)
    card = dataset_card(spark, empty, url_col="url")
    assert card["n_docs"] == 0 and card["n_tokens"] == 0
    assert card["sources"] == {}
    assert card["tokens_per_doc_p10_p50_p90"] is None
    assert card["top_domains"] == []
    assert render_dataset_card(card).startswith("# Dataset card")


def test_dataset_card_markdown_and_cli(spark, tmp_path, capsys):
    from ffi_export_etl_spark.__main__ import main

    inp = str(tmp_path / "corpus")
    _docs(spark).write.parquet(inp)
    md_path = str(tmp_path / "card.md")
    rc = main([
        "dataset-card", "--input", inp, "--url-col", "url",
        "--markdown", md_path, "--title", "My corpus",
    ])
    assert rc == 0
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert card["n_docs"] == 4 and card["markdown"] == md_path
    md = open(md_path).read()
    assert md.startswith("# My corpus")
    assert "| web | 3 | 75.0% |" in md
    assert "a.com: 2" in md
    # the pure render matches the CLI's file output
    card.pop("markdown")
    assert render_dataset_card(card, title="My corpus") == md
