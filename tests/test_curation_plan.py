"""End-to-end curation pipeline test (plans/curation.py): scrub ->
near-dup keeper -> quality filter -> mixture sample -> packing, composed."""

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)
import pytest

from ffi_export_etl_spark.plans.curation import curate_documents


@pytest.fixture()
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today " * 3
    near = base.replace("today", "tonight")
    rows = []
    for i in range(10):
        rows.append(
            (100 + i, f"wiki doc {i} "
             + " ".join(f"w{i}_{j} common words here" for j in range(12)),
             "wiki")
        )
        rows.append(
            (200 + i, f"web doc {i} "
             + " ".join(f"u{i}_{j} other tokens now" for j in range(12)),
             "web")
        )
    rows += [
        (1, base, "wiki"),          # near-dup cluster {1, 2, 4}: min id keeps
        (2, near, "wiki"),
        (3, "too short", "wiki"),   # fails the quality filter
        (4, base + " ok", "web"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_curate_documents_end_to_end(spark, corpus):
    out = curate_documents(
        corpus, mixture={"wiki": 1.0, "web": 0.5}, min_words=10
    )
    res = out.orderBy("id").collect()
    ids = [r["id"] for r in res]

    # near-dup cluster keeps exactly its minimum id; short doc dropped
    assert 1 in ids and 2 not in ids and 4 not in ids
    assert 3 not in ids
    # one keeper per cluster — cluster ids unique in the output
    clusters = [r["cluster_id"] for r in res]
    assert len(set(clusters)) == len(clusters)
    # mixture: all wiki docs kept (rate 1.0), web strictly subsampled
    srcs = [r["source"] for r in res]
    assert srcs.count("wiki") == 11  # 10 wiki + keeper id 1
    assert 0 < srcs.count("web") < 10
    # packing positions tile the surviving corpus contiguously in id order
    for a, b in zip(res, res[1:]):
        assert b["tok_offset"] == a["tok_offset"] + a["n_words"]
    assert all(r["last_seq"] >= r["first_seq"] for r in res)

    # fully deterministic end to end (hash sampling + md5 sketches)
    res2 = curate_documents(
        corpus, mixture={"wiki": 1.0, "web": 0.5}, min_words=10
    ).orderBy("id").collect()
    assert res == res2


def test_curate_documents_scrub_feeds_dedup(spark):
    """Two docs identical except for scrubbed PII must near-dup to one
    keeper: the dedup stage sees SCRUBBED text (ordering matters)."""
    body = " ".join(f"tok{i} shared content words" for i in range(15))
    a = body + " contact alice@example.com now"
    b = body + " contact bob@sample.org now"
    docs = spark.createDataFrame(
        [(1, a, "s"), (2, b, "s")], ["doc_id", "text", "source"]
    )
    res = curate_documents(docs, min_words=5).collect()
    assert [r["id"] for r in res] == [1]
    assert "<EMAIL>" in res[0]["text"]


def test_curate_documents_boilerplate_stage(spark):
    """Shared site-chrome lines are stripped before dedup/quality, so two
    docs identical apart from unique lines below the header collapse to
    distinct keepers with the header gone."""
    header = "MEGA CORP PORTAL - all rights reserved"
    rows = [
        (i, header + "\n" + " ".join(f"doc{i} tok{j}" for j in range(15)), "web")
        for i in range(1, 7)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = curate_documents(
        docs, min_words=10, boilerplate_min_docs=5
    ).collect()
    assert len(out) == 6
    assert all(header not in r["text"] for r in out)
    # without the stage the header remains
    out2 = curate_documents(docs, min_words=10).collect()
    assert all(header in r["text"] for r in out2)


def test_curate_documents_blocklist_and_decontamination(spark):
    """Full-stack: blocklisted domain dropped first, benchmark-overlap
    docs removed on RAW text, the rest flow through unchanged."""
    bench_q = "what is the capital of france and when was it founded exactly"
    good = " ".join(f"good{i} words of clean training text" for i in range(8))
    rows = [
        (1, good, "web", "https://good.org/a"),
        (2, f"leading text {bench_q} trailing", "web", "https://good.org/b"),
        (3, good + " extra tail tokens", "web", "http://spam.com/x"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source", "url"])
    bench = spark.createDataFrame([(9, bench_q)], ["bench_id", "text"])
    out = curate_documents(
        docs,
        min_words=10,
        url_col="url",
        domain_blocklist=["spam.com"],
        benchmark=bench,
    ).collect()
    assert {r["id"] for r in out} == {1}


def test_curate_documents_containment_decontamination(spark):
    """decon_min_containment_pct switches to the normalized rule: a doc
    holding a SMALL absolute overlap that is a LARGE fraction of a short
    bench item is dropped, while the absolute-count default keeps it."""
    bench_q = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler1 = " ".join(f"one{j} red apple orchard" for j in range(10))
    filler2 = " ".join(f"two{j} blue river stones" for j in range(10))
    rows = [
        # bench has 7 4-grams; doc 1 embeds the first 7 tokens -> 4/7 = 57%
        (1, "alpha beta gamma delta epsilon zeta eta " + filler1, "web"),
        (2, filler2 + " unrelated entirely", "web"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    bench = spark.createDataFrame([(9, bench_q)], ["bench_id", "text"])
    kept_norm = {
        r["id"]
        for r in curate_documents(
            docs, min_words=5, benchmark=bench, decon_n=4,
            decon_min_containment_pct=50,
        ).collect()
    }
    assert kept_norm == {2}
    # absolute rule at min_overlap default 1 also drops doc 1; at the
    # normalized 80% bar doc 1 survives (57% < 80)
    kept_high = {
        r["id"]
        for r in curate_documents(
            docs, min_words=5, benchmark=bench, decon_n=4,
            decon_min_containment_pct=80,
        ).collect()
    }
    assert kept_high == {1, 2}


def test_persist_intermediates_equivalent(spark):
    """The persisted-boundary fast path must land the identical result
    as the pure-lazy plan (persist is a performance choice, never a
    semantic one)."""
    from ffi_export_etl_spark.plans.curation import curate_documents

    docs = spark.createDataFrame(
        [
            (i, "s" + str(i % 2), " ".join(f"w{i}_{j}" for j in range(30)))
            for i in range(40)
        ],
        "doc_id: long, source: string, text: string",
    )
    rows = lambda persist: {
        tuple(r)
        for r in curate_documents(
            docs, min_words=5, persist_intermediates=persist
        ).collect()
    }
    assert rows(True) == rows(False)


def test_paragraph_dedup_stage(spark):
    """paragraph_min_repeat strips a syndicated paragraph from all but
    its min-id document before scrubbing, and the rest of the pipeline
    flows unchanged."""
    from ffi_export_etl_spark.plans.curation import curate_documents

    shared = " ".join(f"quote{j}" for j in range(12))
    docs = spark.createDataFrame(
        [
            (1, "s0", f"{shared}\n\n" + " ".join(f"a{j}" for j in range(12))),
            (2, "s0", f"{shared}\n\n" + " ".join(f"b{j}" for j in range(12))),
            (3, "s1", " ".join(f"c{j}" for j in range(12))),
        ],
        "doc_id: long, source: string, text: string",
    )
    out = {
        r["id"]: r["text"]
        for r in curate_documents(
            docs, min_words=5, paragraph_min_repeat=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert "quote0" in out[1]          # canonical copy kept in min-id doc
    assert "quote0" not in out[2]      # stripped from the later doc
    assert out[2].startswith("b0") and "c0" in out[3]


def test_repetition_and_lm_quality_stages(spark):
    """Judge-requested wiring: the quality stage consumes the Gopher
    repetition signals (computed on scrubbed text, pre-packing) and the
    optional CCNet-style bigram-LM threshold drops the least
    reference-like docs."""
    clean = [
        (i, " ".join(f"w{i}_{j} common clean words here" for j in range(8)),
         "wiki")
        for i in range(10)
    ]
    # heavy within-doc repetition: one bigram covers most of the text
    spammy = (50, "buy now " * 30, "web")
    # line-level repetition: the same line over and over
    liney = (51, "\n".join(["identical line of text"] * 12), "web")
    docs = spark.createDataFrame(
        clean + [spammy, liney], ["doc_id", "text", "source"]
    )

    base_ids = {
        r.id for r in curate_documents(docs, min_words=5).collect()
    }
    assert {50, 51} <= base_ids  # without thresholds they survive

    rep_ids = {
        r.id
        for r in curate_documents(
            docs, min_words=5,
            max_dup_line_frac=0.5, max_top_bigram_frac=0.5,
        ).collect()
    }
    assert 50 not in rep_ids and 51 not in rep_ids
    assert {r[0] for r in clean} <= rep_ids

    # LM filter: train on the clean docs, drop gibberish far from them
    gibber = (60, "zxqv plugh xyzzy " * 10, "web")
    docs2 = spark.createDataFrame(
        clean + [gibber], ["doc_id", "text", "source"]
    )
    ref = spark.createDataFrame([t for _, t, _ in clean], "string").toDF(
        "text"
    )
    from ffi_export_etl_spark.operators.lmscore import (
        score_documents,
        train_bigram_lm,
    )

    bigrams, unigrams, vocab = train_bigram_lm(ref)
    scores = {
        r.id: r.avg_neg_logprob
        for r in score_documents(
            docs2, bigrams, unigrams, vocab, id_col="doc_id"
        ).collect()
    }
    cut = (max(scores[i] for i, _, _ in clean) + scores[60]) / 2
    lm_ids = {
        r.id
        for r in curate_documents(
            docs2, min_words=5, lm_reference=ref,
            max_avg_neg_logprob=cut,
        ).collect()
    }
    assert 60 not in lm_ids
    assert {i for i, _, _ in clean} <= lm_ids


def test_epochs_and_split_stages(spark, corpus):
    """epochs: kept docs repeat into DISTINCT token-stream slices (the
    composite-key packing — duplicate ids must not cross-join in the
    position attach); split: every kept doc gets a leakage-safe split
    hashed on its cluster id, identical for docs of one cluster."""
    from ffi_export_etl_spark.plans.curation import release_curation_caches

    out = curate_documents(
        corpus, min_words=10,
        epochs={"wiki": 2.0, "web": 1.0},
        split_val=0.3, split_test=0.3,
    )
    res = out.collect()
    release_curation_caches(out)
    by_id = {}
    for r in res:
        by_id.setdefault(r["id"], []).append(r)
    # wiki keepers appear twice (epoch 0 and 1), web once
    for i, rows in by_id.items():
        src = rows[0]["source"]
        want = 2 if src == "wiki" else 1
        assert len(rows) == want, (i, src, len(rows))
        assert sorted(r["epoch"] for r in rows) == list(range(want))
        # copies occupy DISTINCT token-stream positions
        offs = {r["tok_offset"] for r in rows}
        assert len(offs) == len(rows), i
        # split is per-document (cluster-hashed): identical across copies
        assert len({r["split"] for r in rows}) == 1
    assert {r["split"] for r in res} <= {"train", "val", "test"}
    # the packed stream is contiguous: sorted offsets + n_words tile it
    ordered = sorted(res, key=lambda r: r["tok_offset"])
    pos = 0
    for r in ordered:
        assert r["tok_offset"] == pos, (r["id"], r["epoch"])
        pos += r["n_words"]


def test_curate_cli_epochs_and_split(spark, tmp_path, capsys):
    """--epochs / --split-val / --split-test through the real CLI: the
    shard output carries epoch + split columns and wiki rows doubled."""
    import json as _json

    rows = [
        (i, "doc %d " % i + " ".join(f"t{i}_{j} words here" for j in range(12)),
         "wiki" if i % 2 == 0 else "web")
        for i in range(20)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string"
    ).write.parquet(src)
    out = str(tmp_path / "shards")

    from ffi_export_etl_spark.__main__ import main

    rc = main([
        "curate", "--input", src, "--output", out,
        "--min-words", "5",
        "--epochs", "wiki=2", "--split-val", "0.25",
    ])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs_out"] == 30  # 10 wiki x 2 + 10 web
    got = spark.read.parquet(out)
    assert "epoch" in got.columns and "split" in got.columns
    # ADVICE r8: the (id, epoch) shard-shuffle key is computed, not
    # materialized — no helper column in the training shards
    assert "_shard_key" not in got.columns
    rows_out = got.collect()
    assert sum(1 for r in rows_out if r["source"] == "wiki") == 20
    assert {r["split"] for r in rows_out} <= {"train", "val"}


def test_epochs_rejects_non_integral_ids(spark):
    """ADVICE r8: _rid = id.cast('long') * n_max + epoch is a non-ANSI
    cast — a string id becomes NULL and the _rid equi-join matches
    nothing, so epochs on a string-id corpus would silently return an
    EMPTY curated output. The plan must fail fast instead."""
    import pytest

    docs = spark.createDataFrame(
        [
            (f"doc-{i}", f"doc {i} " + " ".join(
                f"w{i}_{j} real words" for j in range(12)
            ), "web")
            for i in range(30)
        ],
        "doc_id: string, text: string, source: string",
    )
    with pytest.raises(TypeError, match="integral id"):
        curate_documents(docs, min_words=5, epochs={"web": 2.0})
    # no-epochs string ids fail fast too: packing's global_cumsum
    # blocks on a numeric order key (ANSI would otherwise throw
    # CAST_INVALID_INPUT mid-job; non-ANSI would degrade to one block)
    with pytest.raises(TypeError, match="integral id"):
        curate_documents(docs, min_words=5)


def test_split_and_epochs_decorrelated_from_sampling_axis(spark):
    """Review-r7 regression: the split and fractional-epoch hashes must
    NOT reuse the salt-'' md5(id) axis the mixture samplers consume —
    with mixture rate r <= val fraction every kept doc would land in
    val (empty train), and a fractional epoch <= r would give every
    kept doc the extra copy (epochs silently inflated)."""
    from ffi_export_etl_spark.plans.curation import release_curation_caches

    docs = spark.createDataFrame(
        [
            (i, f"doc {i} " + " ".join(
                f"x{i}_{j} distinct words" for j in range(12)
            ), "web")
            for i in range(200)
        ],
        "doc_id: long, text: string, source: string",
    )
    out = curate_documents(
        docs, min_words=5,
        mixture={"web": 0.5},
        split_val=0.5,
        epochs={"web": 1.5},
    )
    rows = out.collect()
    release_curation_caches(out)
    splits = {}
    copies = {}
    for r in rows:
        splits[r["id"]] = r["split"]
        copies[r["id"]] = max(copies.get(r["id"], 0), r["epoch"] + 1)
    # correlated axes would force EVERY kept doc into val / 2 copies
    assert set(splits.values()) == {"train", "val"}, set(splits.values())
    assert set(copies.values()) == {1, 2}, set(copies.values())
