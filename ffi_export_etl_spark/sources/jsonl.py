"""JSONL (newline-delimited JSON) document source with corrupt-record
quarantine.

JSONL is the other web-scale arrival format next to WET (sources/wet.py):
crawl dumps, API exports, and most published text corpora ship as .jsonl
or .jsonl.gz. At 100 TB some lines are ALWAYS broken — truncated uploads,
encoding damage, concatenated objects — and silently dropping them
(DROPMALFORMED) hides data loss while failing the job (FAILFAST) wastes a
cluster run on one bad byte. This reader takes the third route the Spark
JSON datasource is built for and the one a production pipeline wants:

- PERMISSIVE parse with ``columnNameOfCorruptRecord`` (or DROPMALFORMED
  when no required-column contract is given): well-formed rows parse
  into the explicit schema, JVM-side;
- an explicit REQUIRED-column contract: rows that parse as JSON but are
  missing required fields (schema drift, the failure mode PERMISSIVE
  alone does not catch — it just leaves nulls) are quarantined too;
- ``read_documents_jsonl`` returns (clean, quarantine): clean carries
  exactly the declared schema; quarantine carries the VERBATIM offending
  line plus a reason, ready for a dead-letter sink and replay.

The whole path is JVM-side (one scan, codegen filters); the schema is
declared, never inferred — inference is itself a full extra pass and
non-deterministic under drift, both wrong at scale.

Reference parity: the reference only ingests its bespoke XML export
(parser/xml.py:99-180 single format, hard error on malformed); the
quarantine contract here is the scaled-up version of its per-file
error handling (load_data's try/except skip, main.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: Arrival schema for a documents corpus; extra JSON keys are ignored by
#: design (forward-compatible), missing REQUIRED keys quarantine the row.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...],
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a JSONL path/glob under ``schema``.

    ``schema`` must include a ``_corrupt_record`` string field (the
    Spark JSON reader's PERMISSIVE contract). ``required`` names the
    columns that must be non-null for a row to count as clean; rows
    failing it go to quarantine with reason 'missing_required', rows
    that did not parse at all go with reason 'malformed_json' and the
    raw line preserved in ``raw``.

    Clean rows come off the JSON datasource's optimized path;
    quarantine rows come off a text scan + ``from_json`` (the datasource
    forbids lazy queries that reference only the corrupt column, and the
    text route hands the dead-letter sink the verbatim line). Consuming
    both outputs costs two passes over the input — the same as consuming
    both branches of one uncached PERMISSIVE read, and quarantine is
    typically written once.
    """
    if CORRUPT_COL not in schema.names:
        raise ValueError(f"schema must carry a {CORRUPT_COL} string field")
    data_cols = [n for n in schema.names if n != CORRUPT_COL]

    # CLEAN side: the JSON datasource's optimized path. With a required
    # contract, PERMISSIVE + filter; with required=(), "everything that
    # parses" is exactly DROPMALFORMED — same parser, and it avoids the
    # datasource's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (a lazy
    # query may not reference the corrupt column alone, which is all the
    # filter would be).
    if required:
        parsed = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
        keep = F.col(CORRUPT_COL).isNull()
        for c in required:
            keep = keep & F.col(c).isNotNull()
        clean = parsed.filter(keep).select(*data_cols)
    else:
        clean = (
            spark.read.schema(
                T.StructType([f for f in schema if f.name != CORRUPT_COL])
            )
            .option("mode", "DROPMALFORMED")
            .json(path)
        )

    # QUARANTINE side: the text datasource + from_json — no corrupt-
    # column restriction, and the dead-letter record is ALWAYS the
    # verbatim input line (for drift rows too, not a reconstruction).
    # Whitespace-only lines are skipped to match the JSON datasource.
    # Consuming both outputs scans the input twice, same as consuming
    # both branches of a single uncached PERMISSIVE read would.
    lines = spark.read.text(path).filter(F.trim("value") != "")
    j = F.from_json(
        F.col("value"),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    is_malformed = j[CORRUPT_COL].isNotNull()
    missing = F.lit(False)
    for c in required:
        missing = missing | j[c].isNull()
    quarantine = lines.filter(is_malformed | missing).select(
        F.when(is_malformed, F.lit("malformed_json"))
        .otherwise(F.lit("missing_required"))
        .alias("reason"),
        F.col("value").alias("raw"),
    )
    return clean, quarantine


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) for the standard documents corpus layout:
    doc_id + text required, url/source/lang optional."""
    return read_jsonl(
        spark, path, DOCUMENTS_JSONL_SCHEMA, required=("doc_id", "text")
    )
