"""explode/posexplode without the optimizer's inferred-filter tax.

``InferFiltersFromGenerate`` rewrites ``explode(arr)`` into
``Filter(size(arr) > 0) + Generate`` and pushes the filter below the
projection that defines ``arr`` — INLINING the full array expression
into the filter, which then re-evaluates it once per input row on top
of the Generate's own evaluation. For cheap arrays that is a wasted
~2x on the scan (shingling: 0.85s -> 0.30s warm at sf0.1); for
nested-lambda builds it can go quadratic (winnowing's staged selection
re-ran under the filter: 195s vs 3s at sf0.1 — the bug this module
was extracted from).

The rule only fires for non-outer generators (outer explode skips no
rows, so there is nothing to infer), so the fix is: ``posexplode_outer``
+ a filter on the generated POSITION. The position is null exactly when
the array was null/empty — the rows plain explode would drop — and is
non-null for genuinely-null ELEMENTS, so the rewrite is value-identical
to plain explode even on element-nullable arrays. The position filter
references a generated attribute and can never be pushed below the
Generate.

Constant-length arrays (``F.array(lit-struct, ...)`` band/chunk fans)
need none of this: ``size(CreateArray(...))`` constant-folds and the
inferred filter disappears — verified in the optimized plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["explode_nonempty", "posexplode_nonempty"]

_POS = "_xpos"


def explode_nonempty(
    df: DataFrame, keep: list[Column | str], arr: Column | str, alias: str
) -> DataFrame:
    """``df.select(*keep, explode(arr).alias(alias))`` with the inferred
    size-filter suppressed (see module docstring)."""
    out = df.select(
        *keep, F.posexplode_outer(arr).alias(_POS, alias)
    ).filter(F.col(_POS).isNotNull())
    return out.drop(_POS)


def posexplode_nonempty(
    df: DataFrame,
    keep: list[Column | str],
    arr: Column | str,
    pos_alias: str,
    alias: str,
) -> DataFrame:
    """``df.select(*keep, posexplode(arr).alias(pos_alias, alias))``
    with the inferred size-filter suppressed."""
    return df.select(
        *keep, F.posexplode_outer(arr).alias(pos_alias, alias)
    ).filter(F.col(pos_alias).isNotNull())
