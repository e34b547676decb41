"""JSONL (newline-delimited JSON) document source with corrupt-record
quarantine.

JSONL is the other web-scale arrival format next to WET (sources/wet.py):
crawl dumps, API exports, and most published text corpora ship as .jsonl
or .jsonl.gz. At 100 TB some lines are ALWAYS broken — truncated uploads,
encoding damage, concatenated objects — and silently dropping them
(DROPMALFORMED) hides data loss while failing the job (FAILFAST) wastes a
cluster run on one bad byte. This reader takes the third route the Spark
JSON datasource is built for and the one a production pipeline wants:

- PERMISSIVE parse with ``columnNameOfCorruptRecord``: well-formed rows
  parse into the explicit schema; malformed lines land whole in the
  corrupt column, same scan, no second read;
- an explicit REQUIRED-column contract: rows that parse as JSON but are
  missing required fields (schema drift, the failure mode PERMISSIVE
  alone does not catch — it just leaves nulls) are quarantined too;
- ``read_documents_jsonl`` returns (clean, quarantine): clean carries
  exactly the declared schema, quarantine carries the raw offending line
  plus a reason, ready to write to a dead-letter sink for replay.

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

    One scan feeds both outputs — the split is two codegen filters over
    the same parsed relation, and with a .gz input (non-splittable,
    one task per segment file) nothing is read twice unless both
    branches are consumed without a cache, which is the right default:
    quarantine is typically tiny and written once.
    """
    if CORRUPT_COL not in schema.names:
        raise ValueError(f"schema must carry a {CORRUPT_COL} string field")
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    data_cols = [n for n in schema.names if n != CORRUPT_COL]
    is_malformed = F.col(CORRUPT_COL).isNotNull()
    missing = None
    for c in required:
        m = F.col(c).isNull()
        missing = m if missing is None else (missing | m)
    clean = parsed.filter(~is_malformed & ~missing).select(*data_cols)
    quarantine = parsed.filter(is_malformed | missing).select(
        F.when(is_malformed, F.lit("malformed_json"))
        .otherwise(F.lit("missing_required"))
        .alias("reason"),
        # the raw line survives only for malformed rows (PERMISSIVE puts
        # it in the corrupt column); for drift rows reconstruct a JSON
        # view of what DID parse so the dead-letter record is replayable
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*[F.col(c) for c in data_cols])),
        ).alias("raw"),
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
