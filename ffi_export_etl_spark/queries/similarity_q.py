"""Similarity-search queries over the embeddings table (extension surface):
exact brute-force cosine top-k, sign-LSH bucketed top-k, IVF top-k over
label cells, k-means IVF top-k over unlabeled data, per-label centroids.

EVERY query has a full DuckDB oracle. The approximate variants are
engine-portable by construction: hyperplanes and k-means seeds come from
the md5 constant family (functions/porthash.py), every ranking score is
rounded to 6 digits before comparison, and centroid components are
rounded — so the oracle replays bucket assignment, cell assignment, Lloyd
iterations, and probing exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.porthash import duck_md5_long, duck_sign_bucket
from ..operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lloyd_cells,
    lsh_topk,
)
from ..sources.parquet import load_table

TOPK = 10
N_QUERIES = 5  # vec_id 0..4 serve as query vectors
DIM = 64
LSH_PLANES = 8
IVF_NPROBE = 3
KMEANS_K = 8
KMEANS_ITERS = 2


def _queries_df(e: DataFrame) -> DataFrame:
    return e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: broadcast the query side,
    scan the corpus once, per-query window for the top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        e, _queries_df(e), "vec_id", "embedding", "query_id", k=TOPK
    )


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 8-plane sign-LSH bucketing with 1-bit
    multi-probe on the (broadcast) query side — probes 9 of 256 buckets,
    scans the corpus once. Full oracle replays the bucketing."""
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        e, _queries_df(e), DIM, "vec_id", "embedding", "query_id",
        k=TOPK, planes=LSH_PLANES,
    )


def ann_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors, computed dimension-wise with
    posexplode + avg (pure JVM; no Python). Rounded to 6 digits so the
    (order-dependent) double summation matches the oracle bit-for-bit in
    practice. The IVF scale path builds on exactly this: centroids ->
    assign -> probe nearest cells."""
    e = load_table(spark, sf_dir, "embeddings")
    from ..operators.similarity import as_double

    return (
        e.select(
            "label",
            F.posexplode(as_double(F.col("embedding"))).alias("pos", "x"),
        )
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg("x"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: probe the 3 nearest of the label cells per
    query (operators/similarity.py ivf_topk). Full oracle replays the
    rounded centroids and cell ranking."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        e, _queries_df(e), DIM, "vec_id", "embedding", "query_id",
        cell_col="label", k=TOPK, nprobe=IVF_NPROBE,
    )


def ann_topk_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over UNLABELED data: deterministic Lloyd k-means cells
    (md5-seeded init, 2 iterations, rounded scores/centroids) feed the
    same nprobe probing as ann_topk_ivf. Full oracle: the seeding and
    both Lloyd iterations are replayed in SQL."""
    e = load_table(spark, sf_dir, "embeddings")
    cells = lloyd_cells(e, dim=DIM, k=KMEANS_K, iters=KMEANS_ITERS)
    with_cells = e.join(cells, e.vec_id == cells.id).select(
        "vec_id", "embedding", "cell"
    )
    return ivf_topk(
        with_cells, _queries_df(with_cells), DIM, "vec_id", "embedding",
        "query_id", cell_col="cell", k=TOPK, nprobe=IVF_NPROBE,
    )


def ann_cell_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both cell-probed IVF variants union-tagged into one driver row
    (registry-slot fold, precedent: samp_pack): 'ivf' probes the given
    label cells, 'kmeans' probes deterministic Lloyd cells over
    unlabeled data. Same (query_id, nbr_id, cos, rnk) grain; each arm's
    oracle is unchanged, just tagged."""
    ivf = ann_topk_ivf(spark, sf_dir).select(
        F.lit("ivf").alias("kind"), "*"
    )
    km = ann_topk_kmeans(spark, sf_dir).select(
        F.lit("kmeans").alias("kind"), "*"
    )
    return ivf.unionByName(km)


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_cell_pack": ann_cell_pack,
    "ann_label_centroids": ann_label_centroids,
}

# ---------------------------------------------------------------------------
# Oracle SQL
# ---------------------------------------------------------------------------

# (vec_id, vv double-list, nrm) over the whole corpus
_VN = """
        v AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
              FROM embeddings),
        n AS (SELECT vec_id, vv,
                     sqrt(list_sum(list_transform(vv, x -> x * x))) AS nrm
              FROM v)"""

_COS = "round(list_dot_product({a}.vv, {b}.vv) / ({a}.nrm * {b}.nrm), 6)"


def _topk_tail(scored_cte: str) -> str:
    """Shared final ranking: (query_id, nbr_id, cos, rnk<=k)."""
    return f"""
        SELECT query_id, nbr_id, cos, CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, nbr_id) AS rnk
            FROM {scored_cte}
        ) WHERE rnk <= {TOPK}
    """


def _lsh_sql() -> str:
    bucket = duck_sign_bucket(DIM, 0, LSH_PLANES)
    flips = ", ".join(
        f"({v})" for v in [0] + [1 << p for p in range(LSH_PLANES)]
    )
    return f"""
        WITH {_VN},
        cb AS (SELECT vec_id, {bucket} AS bucket FROM v),
        qp AS (SELECT cb.vec_id AS query_id, xor(cb.bucket, f.flip) AS bucket
               FROM cb CROSS JOIN (VALUES {flips}) f(flip)
               WHERE cb.vec_id < {N_QUERIES}),
        cand AS (SELECT DISTINCT qp.query_id, cb.vec_id AS nbr_id
                 FROM cb JOIN qp USING (bucket)
                 WHERE cb.vec_id <> qp.query_id),
        scored AS (
            SELECT c.query_id, c.nbr_id, {_COS.format(a="a", b="q")} AS cos
            FROM cand c
            JOIN n a ON a.vec_id = c.nbr_id
            JOIN n q ON q.vec_id = c.query_id
        )
        {_topk_tail("scored")}
    """


# centroids of ``assign`` (cell, vec_id) using corpus vectors: rounded
# per-dimension means -> (cell, cent list, cnrm)
def _cents_sql(name: str, assign: str) -> str:
    return f"""
        {name}_flat AS (
            SELECT {assign}.cell,
                   CAST(generate_subscripts(v.vv, 1) - 1 AS INTEGER) AS pos,
                   unnest(v.vv) AS x
            FROM {assign} JOIN v ON v.vec_id = {assign}.vec_id),
        {name}_d AS (SELECT cell, pos, round(avg(x), 6) AS cx
                     FROM {name}_flat GROUP BY cell, pos),
        {name} AS (SELECT cell, list(cx ORDER BY pos) AS cent
                   FROM {name}_d GROUP BY cell),
        {name}_n AS (SELECT cell, cent,
                            sqrt(list_sum(list_transform(cent, x -> x * x)))
                                AS cnrm
                     FROM {name})"""


# assignment pass: every corpus vector to its argmax-rounded-cosine cell
def _assign_sql(name: str, cents_n: str) -> str:
    return f"""
        {name} AS (
            SELECT vec_id, cell FROM (
                SELECT n.vec_id, c.cell,
                       row_number() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY round(list_dot_product(n.vv, c.cent)
                                          / (n.nrm * c.cnrm), 6) DESC, c.cell
                       ) AS rk
                FROM n CROSS JOIN {cents_n} c
            ) WHERE rk = 1)"""


def _probe_topk_sql(cells_cte: str, cents_n: str) -> str:
    """Probe the nprobe nearest cells per query, rank candidates."""
    return f"""
        probes AS (
            SELECT query_id, cell FROM (
                SELECT q.vec_id AS query_id, c.cell,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY round(list_dot_product(q.vv, c.cent)
                                          / (q.nrm * c.cnrm), 6) DESC, c.cell
                       ) AS crnk
                FROM n q CROSS JOIN {cents_n} c
                WHERE q.vec_id < {N_QUERIES}
            ) WHERE crnk <= {IVF_NPROBE}),
        scored AS (
            SELECT p.query_id, a.vec_id AS nbr_id,
                   {_COS.format(a="c", b="q")} AS cos
            FROM probes p
            JOIN {cells_cte} a ON a.cell = p.cell
            JOIN n c ON c.vec_id = a.vec_id
            JOIN n q ON q.vec_id = p.query_id
            WHERE a.vec_id <> p.query_id
        )
        {_topk_tail("scored")}
    """


def _ivf_sql() -> str:
    return f"""
        WITH {_VN},
        lab AS (SELECT vec_id, label AS cell FROM embeddings),
        {_cents_sql("cents", "lab")},
        {_probe_topk_sql("lab", "cents_n")}
    """


def _kmeans_sql() -> str:
    seed_key = duck_md5_long("CAST(vec_id AS VARCHAR)", 15)
    return f"""
        WITH {_VN},
        seeds AS (
            SELECT vec_id,
                   CAST(row_number() OVER (ORDER BY {seed_key}, vec_id) - 1
                        AS INTEGER) AS cell
            FROM v QUALIFY cell < {KMEANS_K}),
        c0_n AS (SELECT s.cell, n.vv AS cent, n.nrm AS cnrm
                 FROM seeds s JOIN n ON n.vec_id = s.vec_id),
        {_assign_sql("a1", "c0_n")},
        {_cents_sql("c1", "a1")},
        {_assign_sql("a2", "c1_n")},
        {_cents_sql("c2", "a2")},
        {_probe_topk_sql("a2", "c2_n")}
    """


ORACLE = {
    "ann_topk_bruteforce": f"""
        WITH {_VN},
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                   {_COS.format(a="c", b="q")} AS cos
            FROM n c JOIN n q
              ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        )
        {_topk_tail("scored")}
    """,
    "ann_topk_lsh": _lsh_sql(),
    "ann_cell_pack": f"""
        SELECT 'ivf' AS kind, * FROM ({_ivf_sql()})
        UNION ALL
        SELECT 'kmeans' AS kind, * FROM ({_kmeans_sql()})
    """,
    "ann_label_centroids": """
        WITH flat AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER)
                       AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
        SELECT label, pos, round(avg(x), 6) AS centroid_val,
               count(*) AS n_vectors
        FROM flat GROUP BY label, pos
    """,
}
