"""Common Crawl WET (WARC text-conversion) source.

WET is the arrival format for web-scale text corpora: a concatenation of
records, each "WARC/1.0\\r\\n" + header lines + blank line + extracted
plain-text body, records separated by a blank line. This reader turns a
glob of .warc.wet(.gz) files into a (url, wet_date, record_id,
content_length, text) DataFrame with NO Python in the record loop:

- record splitting is done by the text datasource itself via a custom
  ``lineSep`` of "\\r\\n\\r\\nWARC/1.0\\r\\n" (the inter-record boundary),
  so the JVM reader emits one row per record straight off the wire;
- header fields are pulled with native regexp_extract / split exprs
  (whole-stage codegen, one pass per record).

Scale notes: .gz members are not splittable — one task per file — which
matches Common Crawl's layout of many ~150 MB wet.gz segments; pass the
segment glob and the scan parallelizes per file. The boundary string
appearing verbatim inside a body would split that record early; the
standard CC extraction never emits it (bodies are blank-line-normalized
text), the same practical assumption the usual WET tooling makes.

Reference parity: the reference ingests one bespoke XML export format
(parser/xml.py); this engine adds the web-crawl arrival format the
LLM-pipeline brief calls for alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SEP = "\r\n\r\nWARC/1.0\r\n"


def read_wet(
    spark: SparkSession,
    path: str,
    keep_types: tuple[str, ...] = ("conversion",),
) -> DataFrame:
    """Parse WET files under ``path`` (file, dir, or glob) into
    (url, wet_date, record_id, content_length, text).

    ``keep_types`` filters on WARC-Type — ("conversion",) by default,
    which drops each file's leading warcinfo record; pass () to keep
    every record type.
    """
    raw = spark.read.option("lineSep", RECORD_SEP).text(path)
    # the first record of each file keeps its own leading magic (it is
    # not preceded by a blank line); later records lost theirs to the
    # separator — strip it where present, then split headers from body
    # at the first blank line
    rec = raw.select(
        F.regexp_replace(F.col("value"), r"\AWARC/1\.0\r\n", "").alias("_rec")
    )
    parts = rec.select(
        "_rec", F.split(F.col("_rec"), r"\r\n\r\n", 2).alias("_hb")
    )
    out = parts.select(
        F.regexp_extract(
            F.element_at("_hb", 1), r"(?m)^WARC-Type:\s*([^\r\n]+)", 1
        ).alias("warc_type"),
        F.regexp_extract(
            F.element_at("_hb", 1), r"(?m)^WARC-Target-URI:\s*([^\r\n]+)", 1
        ).alias("url"),
        F.to_timestamp(
            F.regexp_extract(
                F.element_at("_hb", 1), r"(?m)^WARC-Date:\s*([^\r\n]+)", 1
            ),
            "yyyy-MM-dd'T'HH:mm:ssX",
        ).alias("wet_date"),
        F.regexp_extract(
            F.element_at("_hb", 1), r"(?m)^WARC-Record-ID:\s*([^\r\n]+)", 1
        ).alias("record_id"),
        F.regexp_extract(
            F.element_at("_hb", 1), r"(?m)^Content-Length:\s*(\d+)", 1
        ).cast("int").alias("content_length"),
        # body = everything after the first blank line; trailing record
        # padding (the CRLFs that feed the next separator) trimmed.
        # \z, not \Z: Java's \Z matches BEFORE a final line terminator
        # (and a bare \r counts), so (\r?\n)+\Z on a body ending in \r
        # would strip newlines INSIDE the body (hypothesis-found:
        # '\n\r' became '\r'); \z is the absolute end, matching
        # Python's \Z semantics the tests normalize with
        F.regexp_replace(
            F.coalesce(F.element_at("_hb", 2), F.lit("")), r"(\r?\n)+\z", ""
        ).alias("text"),
    )
    if keep_types:
        out = out.filter(F.col("warc_type").isin(*keep_types))
    return out.drop("warc_type") if keep_types == ("conversion",) else out
