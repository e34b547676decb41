"""FFI XML export -> per-tag DataFrames (SURVEY.md section 2.1 S2/S3).

An FFI export is one XML document whose top-level children are row
elements; the element tag is the table name and child elements are the
columns (/root/reference/parser/xml.py:101-124). The reference ET.parses
the whole DOM on one thread; here:

1. **Tag discovery** is a streaming driver-side pre-scan (iterparse over
   depth-1 start events only — no DOM, O(file) bytes, O(#tags) memory).
   The XML namespace is discovered from the root tag exactly like the
   reference's regex (parser/xml.py:41, functions.py:111-121).
2. **Per-tag extraction** uses Spark's native XML reader (Spark 4), one
   ``rowTag`` read per discovered tag — each read is a distributed JVM
   parse, and heterogeneous rows of one tag union their columns the same
   way the reference's pd.concat NaN-fills (schema union).
3. **Ingest casts** mirror parser/xml.py:119-123: every value is a string;
   ``*_GUID*`` columns uppercased, Date/Time columns normalized.

At 100 TB the unit of parallelism is the *file* (directories of exports);
per-file tag sets are discovered once and reads fan out per (glob, tag).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_norm import is_datetime_column, normalize_datetime
from ..functions.idents import upper_guid

_NS_RE = re.compile(r"^\{(.*)\}")


def strip_namespace(tag: str) -> str:
    """Remove the '{uri}' prefix from a qualified tag
    (reference functions.py:111-121)."""
    return _NS_RE.sub("", tag, count=1)


def discover_tags(path: str) -> tuple[str | None, list[str]]:
    """Stream the file once on the driver; return (namespace URI or None,
    ordered distinct depth-1 tags). Never builds a DOM."""
    ns: str | None = None
    tags: dict[str, None] = {}
    depth = 0
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            depth += 1
            if depth == 1:
                m = _NS_RE.match(elem.tag)
                ns = m.group(1) if m else None
            elif depth == 2:
                tags[strip_namespace(elem.tag)] = None
        else:
            depth -= 1
            if depth >= 1:
                elem.clear()  # keep memory O(1)
    return ns, list(tags)


def ingest_casts(df: DataFrame) -> DataFrame:
    """Reference per-column ingest rules (parser/xml.py:119-123):
    uppercase GUID columns, normalize Date/Time columns."""
    exprs = []
    for c in df.columns:
        if "_GUID" in c or c.endswith("GUID"):
            exprs.append(upper_guid(c).alias(c))
        elif is_datetime_column(c):
            exprs.append(normalize_datetime(c).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def read_ffi_export(
    spark: SparkSession,
    path: str,
    tags: Iterable[str] | None = None,
    apply_casts: bool = True,
) -> dict[str, DataFrame]:
    """Read one FFI export (or a glob of exports) into {table: DataFrame}.

    All columns are StringType (no inference), matching the reference's
    stringly-typed ingest (parser/xml.py:115). Tags absent from a given
    file simply produce empty frames.
    """
    if tags is None:
        _, tags = discover_tags(path)
    out: dict[str, DataFrame] = {}
    for tag in tags:
        df = (
            spark.read.format("xml")
            .option("rowTag", tag)
            .option("inferSchema", "false")
            .option("ignoreNamespace", "true")
            .load(path)
        )
        # Native XML may surface attributes (none in FFI exports) or value
        # columns; keep string typing uniform.
        df = df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])
        out[tag] = ingest_casts(df) if apply_casts else df
    return out
