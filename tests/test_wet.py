"""Common Crawl WET source (sources/wet.py): record splitting via the
text datasource lineSep, native header extraction, gz segment globs."""

from __future__ import annotations



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
