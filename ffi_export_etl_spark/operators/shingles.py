"""Shingling + n-gram Jaccard similarity — the exact (non-approximate)
near-duplicate path.

All steps are native Column expressions (JVM-side, whole-stage codegen):
tokenize -> word n-gram shingles -> explode -> self-join on shingle ->
integer Jaccard test. The self-join is the classic candidate-pair explosion
(quadratic in the worst case) — correct at small scale, and the reason the
MinHash-LSH path (operators/minhash.py) exists for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    return F.split(text, r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (empty array if too short).

    Built from n shifted array slices folded with zip_with — O(len) per
    document. (The naive transform(sequence, i -> element_at(toks, i+j))
    formulation re-evaluates the split() for every element access because
    Catalyst inlines the unaliased expression into the lambda — O(len^2)
    and 10x wall-clock on real documents.)
    """
    t = tokens(text)
    length = F.greatest(F.size(t) - (n - 1), F.lit(0))
    shingle = F.slice(t, 1, length)
    for j in range(1, n):
        shingle = F.zip_with(
            shingle,
            F.slice(t, 1 + j, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(shingle)


def shingle_table(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) long table, one row per distinct shingle per doc.

    Repartitions by id first: document corpora often arrive as few large
    files (locally: ONE parquet file -> one partition), and shingling is
    the CPU-heavy step — without the spread it runs on one core. At scale
    the same holds after heavy upstream filters; AQE coalesces if the
    shuffle is unnecessary.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    # Two-step projection: materialize the token array ONCE, then build
    # shingles from the attribute — word_shingles references its input
    # n+1 times, and CollapseProject keeps the split un-inlined only when
    # it is already a separate multi-referenced alias.
    toks = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    )
    length = F.greatest(F.size("_toks") - (n - 1), F.lit(0))
    shingle = F.slice("_toks", 1, length)
    for j in range(1, n):
        shingle = F.zip_with(
            shingle,
            F.slice("_toks", 1 + j, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return toks.select(
        "id", F.explode(F.array_distinct(shingle)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 20,
) -> DataFrame:
    """All doc pairs with n-gram Jaccard >= threshold_pct/100.

    Jaccard is tested in *integer* arithmetic (inter*100 >= pct*union) so
    results are bit-identical across engines. Returns
    (id_a, id_b, n_inter, n_union, jaccard) with id_a < id_b.
    """
    sh = shingle_table(docs, id_col, text_col, n)
    sh.persist()  # feeds sizes + both sides of the self-join
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.col("n_inter") * 100 >= threshold_pct * F.col("n_union"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            (F.col("n_inter") / F.col("n_union")).alias("jaccard"),
        )
    )
