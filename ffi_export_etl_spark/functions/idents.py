"""Business-key synthesis as native Column expressions (no UDFs).

The reference builds PlotID / EventID / ProjectID / VisitID with row-wise
``DataFrame.apply`` lambdas (/root/reference/parser/xml.py:138-195,
529-547, 723-731); every one of them is expressible as a Column expression
chain, so the whole key-synthesis layer runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ident(col: Column | str) -> Column:
    """Uppercase + strip ``' '``, ``'_'``, ``'-'``, ``'.'``
    (parser/xml.py:158-159)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.translate(c, " _-.", ""))


def plot_id(admin_unit_name: Column | str, plot_name: Column | str) -> Column:
    """PlotID = first 5 chars of normalized admin-unit name + normalized
    plot name (parser/xml.py:151-160)."""
    return F.concat(
        F.substring(normalize_ident(admin_unit_name), 1, 5),
        normalize_ident(plot_name),
    )


def event_date_compact(sample_event_date: Column | str) -> Column:
    """yyyymmdd extracted from a SampleEvent_Date string
    (parser/xml.py:172-174: regex date extract, dashes removed)."""
    c = (
        F.col(sample_event_date)
        if isinstance(sample_event_date, str)
        else sample_event_date
    )
    return F.translate(
        F.regexp_extract(c, r"(\d{4}-\d{2}-\d{2})", 1), "-", ""
    )


def event_id(plot_id_col: Column | str, sample_event_date: Column | str) -> Column:
    """EventID = PlotID + yyyymmdd; empty string when the plot lookup
    failed (parser/xml.py:163-177: '' default, rows later dropped) OR the
    date has no yyyy-mm-dd part (divergence: the reference raises
    IndexError there, xml.py:172-173; '' routes the row into the same
    drop path as a missing plot)."""
    p = F.col(plot_id_col) if isinstance(plot_id_col, str) else plot_id_col
    d = event_date_compact(sample_event_date)
    return F.when(
        p.isNull() | (p == "") | d.isNull() | (d == ""), F.lit("")
    ).otherwise(F.concat(p, d))


def project_id(project_unit_name: Column | str) -> Column:
    """ProjectID = ProjectUnit_Name minus '_' and ' '
    (parser/xml.py:723-727)."""
    c = (
        F.col(project_unit_name)
        if isinstance(project_unit_name, str)
        else project_unit_name
    )
    return F.translate(c, "_ ", "")


def visit_id(
    project_id_col: Column,
    visit_year: Column,
    prefix: Column,
    base: Column,
    suffix: Column,
) -> Column:
    """VisitID synthesis (parser/xml.py:529-547), the reference's nested
    ternaries as a when-chain:

    - year contributes only when non-null;
    - Base contributes only when == 'Fire';
    - suffix: null -> nothing, 'Immediate' -> first 3 chars ('Imm'),
      anything else -> itself.
    """
    year_part = F.when(
        visit_year.isNull(), F.lit("")
    ).otherwise(visit_year.cast("int").cast("string"))
    base_part = F.when(base == "Fire", F.coalesce(base, F.lit(""))).otherwise(
        F.lit("")
    )
    suffix_part = (
        F.when(suffix.isNull(), F.lit(""))
        .when(suffix == "Immediate", F.substring(suffix, 1, 3))
        .otherwise(suffix)
    )
    return F.concat(
        project_id_col,
        year_part,
        F.coalesce(prefix, F.lit("")),
        base_part,
        suffix_part,
    )


# SQL rendering of parse_list_val, used to build the whole expression
# tree in ONE py4j round-trip (r12): the Column-API construction below
# costs ~170 gateway round-trips per call (split/when/size/transform/
# filter each go through the socket, and the two lambdas are the
# heaviest), which profiled at ~0.75s per FILE in the batch loader's
# _process_events — pure driver-side construction latency, multiplied
# by every file of a batch. The SQL tree is operator-for-operator the
# Column tree (split's default limit is -1 in both; the delimiters are
# regex-literal-safe), pinned value-identical by the reference-parity
# and hypothesis property tests.
_PARSE_LIST_SQL = (
    "CASE WHEN {c} IS NULL OR {c} = 'nan' OR {c} = '' OR {c} = ' ' "
    "THEN CAST(array() AS ARRAY<STRING>) "
    "ELSE filter(transform("
    "CASE WHEN size(split({c}, ',')) > 1 THEN split({c}, ',') "
    "WHEN size(split({c}, ' ')) > 1 THEN split({c}, ' ') "
    "WHEN size(split({c}, '/')) > 1 THEN split({c}, '/') "
    "ELSE split({c}, ',') END, "
    "x -> trim(x)), x -> x != '') END"
)

_EMPTY_LIST_SQL = "CAST(array() AS ARRAY<STRING>)"


def parse_list_val(col: Column | str) -> Column:
    """Multi-delimiter personnel-list split (parser/xml.py:375-395).

    Exact reference delimiter choice: comma wins when it yields >1 token;
    else space when it yields >1; else slash when it yields >1; else the
    whole (trimmed) value. Null/'nan'/''/' ' -> empty list. Items are
    trimmed; empties dropped (reference keeps ''-items only in the
    degenerate single-token case, where trimming makes it moot).

    Given a column NAME, the expression is built as one SQL string
    (single py4j round-trip — see _PARSE_LIST_SQL); a Column argument
    takes the equivalent Column-API path.
    """
    if isinstance(col, str):
        return F.expr(_PARSE_LIST_SQL.format(c=f"`{col}`"))
    c = col
    by_comma = F.split(c, ",")
    by_space = F.split(c, " ")
    by_slash = F.split(c, "/")
    chosen = (
        F.when(F.size(by_comma) > 1, by_comma)
        .when(F.size(by_space) > 1, by_space)
        .when(F.size(by_slash) > 1, by_slash)
        .otherwise(by_comma)
    )
    cleaned = F.filter(
        F.transform(chosen, lambda x: F.trim(x)), lambda x: x != ""
    )
    empty_ish = (
        c.isNull() | (c == "nan") | (c == "") | (c == " ")
    )
    return F.when(empty_ish, F.array().cast("array<string>")).otherwise(cleaned)


def combine_teams(*cols: Column | str | None) -> Column:
    """Union of personnel lists across columns -> sorted, deduped,
    comma-joined string (parser/xml.py:413-450).

    The reference joins a Python ``set`` — nondeterministic order (quirk
    Q9); we sort (array_sort) so output is deterministic and set-equal.

    With column NAMES (or None for an absent column, which contributes
    an empty list exactly like the old ``parse_list_val(lit(None))``),
    the whole tree is ONE SQL expression / one py4j round-trip (r12 —
    this call was the single biggest expression-construction cost in
    the batch loader's per-file driver phase); Column arguments take
    the equivalent Column-API path.
    """
    if all(c is None or isinstance(c, str) for c in cols):
        parts = [
            _PARSE_LIST_SQL.format(c=f"`{c}`")
            if c is not None
            else _EMPTY_LIST_SQL
            for c in cols
        ]
        inner = parts[0] if len(parts) == 1 else f"concat({', '.join(parts)})"
        return F.expr(
            f"array_join(array_sort(array_distinct({inner})), ', ')"
        )
    arrays = [parse_list_val(c) for c in cols]
    combined = arrays[0]
    for a in arrays[1:]:
        combined = F.concat(combined, a)
    return F.array_join(F.array_sort(F.array_distinct(combined)), ", ")


def upper_guid(col: Column | str) -> Column:
    """GUID normalization: uppercase (parser/xml.py:119-121)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(c)


def generated_guid() -> Column:
    """Per-row uppercase UUID (parser/xml.py:340-341 — which has an axis
    bug producing all-NaN, quirk Q3; this is the intended semantics)."""
    return F.upper(F.expr("uuid()"))
