"""Common Crawl WET source (sources/wet.py): record splitting via the
text datasource lineSep, native header extraction, gz segment globs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _wet_bytes() -> bytes:
    """A faithful two-conversion-record WET file: leading warcinfo
    record, CRLF headers, bodies containing blank lines and lone
    'WARC'-prefixed text that must NOT split records."""
    def rec(headers: list[str], body: str) -> bytes:
        b = body.encode()
        head = "".join(h + "\r\n" for h in headers)
        return (
            b"WARC/1.0\r\n"
            + head.encode()
            + f"Content-Length: {len(b)}\r\n".encode()
            + b"\r\n"
            + b
        )
    parts = [
        rec(
            ["WARC-Type: warcinfo", "WARC-Date: 2024-05-01T00:00:00Z"],
            "software: test-wet-writer",
        ),
        rec(
            [
                "WARC-Type: conversion",
                "WARC-Target-URI: https://example.com/a",
                "WARC-Date: 2024-05-01T01:02:03Z",
                "WARC-Record-ID: <urn:uuid:aaa>",
            ],
            "first paragraph\n\nsecond paragraph\nWARC records are fun",
        ),
        rec(
            [
                "WARC-Type: conversion",
                "WARC-Target-URI: https://example.org/b?q=1",
                "WARC-Date: 2024-05-01T02:00:00Z",
                "WARC-Record-ID: <urn:uuid:bbb>",
            ],
            "unicode ok: café — done",
        ),
    ]
    return b"\r\n\r\n".join(parts) + b"\r\n\r\n"


def test_read_wet_parses_records(spark, tmp_path):
    from ffi_export_etl_spark.sources.wet import read_wet

    p = tmp_path / "seg-00001.warc.wet"
    p.write_bytes(_wet_bytes())
    rows = {
        r["url"]: r for r in read_wet(spark, str(p)).collect()
    }
    assert set(rows) == {"https://example.com/a", "https://example.org/b?q=1"}
    a = rows["https://example.com/a"]
    assert a["text"] == "first paragraph\n\nsecond paragraph\nWARC records are fun"
    assert a["record_id"] == "<urn:uuid:aaa>"
    assert a["content_length"] == len(a["text"].encode())
    assert str(a["wet_date"]).startswith("2024-05-01 01:02:03")
    b = rows["https://example.org/b?q=1"]
    assert b["text"] == "unicode ok: café — done"
    # keep_types=() keeps the warcinfo record too, with its type column
    all_rows = read_wet(spark, str(tmp_path), keep_types=()).collect()
    assert len(all_rows) == 3
    assert {r["warc_type"] for r in all_rows} == {"warcinfo", "conversion"}


def test_read_wet_gzip_segments_glob(spark, tmp_path):
    """Two .wet.gz segments via glob — the CC layout; gz is one task per
    file, which is exactly the per-segment parallelism wanted."""
    import gzip

    from ffi_export_etl_spark.sources.wet import read_wet

    raw = _wet_bytes()
    for i in (1, 2):
        (tmp_path / f"seg-{i:05d}.warc.wet.gz").write_bytes(
            gzip.compress(raw)
        )
    df = read_wet(spark, str(tmp_path / "*.warc.wet.gz"))
    assert df.count() == 4
    assert df.filter(df.text.contains("second paragraph")).count() == 2


def test_crawl_to_training_shards_end_to_end(spark, tmp_path):
    """The full arrival-to-training story on one synthetic crawl: WET
    segments -> read_wet -> curate_documents (blocklist + near-dup +
    quality + packing) -> write_training_shards. Pins that the composed
    path holds together: blocklisted domain gone, dup collapsed to one
    keeper, every surviving doc packed and sharded in a reproducible
    stream order."""
    import glob as _glob

    from ffi_export_etl_spark.plans.curation import curate_documents
    from ffi_export_etl_spark.sinks.shards import write_training_shards
    from ffi_export_etl_spark.sources.wet import read_wet

    def rec(url: str, body: str) -> bytes:
        b = body.encode()
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
            + f"WARC-Record-ID: <urn:uuid:{url}>\r\n".encode()
            + f"Content-Length: {len(b)}\r\n".encode()
            + b"\r\n"
            + b
        )

    good = [
        rec(
            f"https://site{i}.example/page",
            " ".join(f"doc{i} token{j} word{i}_{j}" for j in range(12)),
        )
        for i in range(8)
    ]
    dup = rec("https://site0.example/copy", " ".join(
        f"doc0 token{j} word0_{j}" for j in range(12)))
    blocked = rec("https://spam.bad/x", "blocked " * 40)
    wet = b"\r\n\r\n".join(good + [dup, blocked]) + b"\r\n\r\n"
    (tmp_path / "crawl.warc.wet").write_bytes(wet)

    # id must be DETERMINISTIC (content-derived): the curation plan
    # re-reads its input from several branches, and a nondeterministic
    # id (monotonically_increasing_id) would reshuffle between them
    docs = read_wet(spark, str(tmp_path / "crawl.warc.wet")).select(
        F.crc32(F.col("url")).alias("doc_id"),
        F.col("url"),
        F.lit("crawl").alias("source"),
        F.col("text"),
    )
    curated = curate_documents(
        docs,
        min_words=10,
        url_col="url",
        domain_blocklist=["spam.bad"],
        capacity=64,
    )
    rows = curated.collect()
    texts = [r["text"] for r in rows]
    # 10 records in; spam.bad blocklisted, the site0 copy collapses into
    # doc0's cluster -> 8 distinct survivors, doc0 exactly once
    assert len(rows) == 8
    assert not any("blocked" in t for t in texts)
    assert sum("doc0" in t for t in texts) == 1

    manifest = write_training_shards(
        curated.drop("url"), str(tmp_path / "shards"), "id",
        rows_per_shard=4, num_partitions=2,
    ).collect()
    assert sum(m["n_rows"] for m in manifest) == 8
    files = sorted(_glob.glob(str(tmp_path / "shards") + "/part-*.parquet"))
    assert all(
        len(spark.read.parquet(f).collect()) <= 4 for f in files
    )
