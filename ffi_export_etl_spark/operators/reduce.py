"""Embedding dimensionality reduction (PCA) — the preprocessing step
the SemDeDup / embedding-clustering literature runs before k-means at
corpus scale: projecting to the top-k principal axes cuts the ANN /
SemDeDup cell-assignment cost by dim/k and removes noise directions.

Built on public pyspark.ml PCA (the quality_model.py precedent):
fitting computes the covariance eigendecomposition from ONE pass over
the corpus (the model is k x dim — driver/model-sized); transforming is
one JVM matrix-multiply projection per row, no Python in the row path.

Reference parity note: the reference engine (NMFWRI/FFI-Export-ETL) has
no vector surface; this extends the similarity/embedding family.

Determinism: eigendecomposition is RNG-free, but each principal axis is
only defined up to sign. ``fit_pca`` normalizes every component so its
largest-|loading| coordinate is positive — making the learned basis
(and all downstream projections) engine- and partitioning-independent,
and directly comparable to a numpy twin normalized the same way
(pinned by test). pyspark.ml's PCA quirk, preserved deliberately: the
covariance is computed on CENTERED data but ``transform`` projects the
RAW (uncentered) vector; the numpy twin in the tests replays exactly
that, so the pin would catch a silent upstream behavior change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_pca", "reduce_embeddings"]


def fit_pca(
    df: DataFrame, vec_col: str, k: int
) -> list[list[float]]:
    """Fit a k-component PCA basis over an ``array<float>`` column.
    Returns the components as k rows of dim floats (model-sized), each
    sign-normalized so its largest-|loading| coordinate is positive."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    assembled = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    )
    model = PCA(k=k, inputCol="_v", outputCol="_p").fit(assembled)
    # pc is dim x k column-major; pull columns out as the k components
    pc = model.pc.toArray()  # numpy (dim, k) — model-sized
    comps: list[list[float]] = []
    for j in range(k):
        col = pc[:, j]
        m = max(range(len(col)), key=lambda i: abs(col[i]))
        if col[m] < 0:
            col = -col
        comps.append([float(x) for x in col])
    return comps


def reduce_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    out_col: str = "reduced",
    components: list[list[float]] | None = None,
) -> DataFrame:
    """Project ``vec_col`` onto ``k`` principal axes, appending
    ``out_col`` as ``array<double>``. ``components`` (from fit_pca)
    reuses a saved basis — fit once on a sample or yesterday's corpus,
    transform 100 TB with a pure Column expression; omitted, the basis
    is fit on ``df`` itself first (two passes total).

    The projection is a JVM higher-order fold per component — the
    component vectors are literals baked into the plan (k x dim
    doubles, kilobytes for real embedding sizes), so the transform is a
    single JVM projection over the scan (plan-audited): no UDF, no
    join, no broadcast table, no Python anywhere in the row path."""
    if components is None:
        components = fit_pca(df, vec_col, k)
    x = F.col(vec_col).cast("array<double>")
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    x,
                    F.array(*[F.lit(float(c)) for c in comp]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for comp in components
        ]
    )
    return df.withColumn(out_col, proj)
