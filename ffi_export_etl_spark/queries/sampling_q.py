"""Deterministic-sampling gate query (operators/sampling.py).

Curation runs must be reproducible: membership is decided by the portable
md5 family over the row key (never a partition-seeded RNG), so the same
rows make the cut on any cluster, any partitioning, any engine — and the
DuckDB oracle replays the exact membership decision, giving the driver a
full value-hash check over both samplers.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.porthash import MERSENNE31, duck_md5_long
from .dedup_q import _minhash_pairs_sql, components_ctes
from ..operators.sampling import (
    HASH_SPACE,
    NULL_KEY_SENTINEL,
    hash_sample,
    split_train_val_test,
    stratified_take,
    weighted_sample,
)
from ..sources.parquet import load_table

SAMPLE_FRACTION = 0.25
SAMPLE_THRESHOLD = int(SAMPLE_FRACTION * HASH_SPACE)  # mirrors hash_sample
STRAT_N = 5
# data-mixture weights: named sources at explicit rates, the long tail at
# the default — exercises both paths of weighted_sample
MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
MIX_DEFAULT = 0.05
SPLIT_VAL = 0.1
SPLIT_TEST = 0.05
SPLIT_VAL_T = int(SPLIT_VAL * HASH_SPACE)
SPLIT_TEST_T = int((SPLIT_VAL + SPLIT_TEST) * HASH_SPACE)
# token-budget mix: two sources capped by token count (whitespace
# tokens), everything else budget 0 — the "N tokens from source X" form
BUDGET_TOKENS = {"src0": 700, "src1": 300}
# temperature-mixture arm: expected kept docs under alpha=0.5 mixing
TEMP_BUDGET = 300
# epoch-upsampling arm: weights ABOVE 1 — src0 repeats 2.5x (two full
# copies + a deterministic fractional half), src1 stays at 1, src2
# drops; everything else defaults to 1 epoch
EPOCHS = {"src0": 2.5, "src1": 1.0, "src2": 0.0}
EPOCH_DEFAULT = 1.0


def samp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four sampling surfaces union-tagged into one driver row: a
    deterministic 25% Bernoulli sample of documents (hash_sample — one
    scan, no shuffle), an exact 5-per-label stratified take of
    embeddings (stratified_take — one label-partitioned window), a
    per-source data-mixture sample of documents (weighted_sample —
    per-group rates via a CASE threshold, no join, no shuffle), and the
    full train/val/test assignment (split_train_val_test — every doc
    tagged split_train/val/test on the same hash axis, disjoint and
    exhaustive by construction), plus the token-BUDGET mixture
    (token_budget_sample — per-source hash-ordered runs capped by token
    count via the blocked two-pass cumsum; 'budget' rows), and the
    temperature (alpha=0.5) mixture (temperature_sample — in-plan
    sqrt-share rates with the ordered normalizer fold, so the oracle's
    doubles are bit-identical; 'temp' rows), and the r7 LEAKAGE-SAFE
    cluster split (split_by_cluster — assignment hashes the minhash
    near-dup CLUSTER id, so near-duplicates always land in the same
    split; 'csplit_*' rows; oracle derives clusters with the recursive
    reachability CTEs shared with dedup_connected_components), and the
    r7 EPOCH upsampling (epoch_upsample — "N epochs of source X",
    weights above 1: floor(N) full copies + a deterministic hash-kept
    fractional copy; 'epoch' rows carry the copy index in label)."""
    from ..operators.components import dedup_clusters
    from ..operators.minhash import minhash_near_duplicates
    from ..operators.sampling import (
        epoch_upsample,
        split_by_cluster,
        temperature_sample,
        token_budget_sample,
    )
    from .dedup_q import BANDS, JACCARD_PCT, NUM_PERM

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bern = hash_sample(d, "doc_id", SAMPLE_FRACTION).select(
        F.lit("bernoulli").alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    strat = stratified_take(e, "label", "vec_id", STRAT_N).select(
        F.lit("stratified").alias("kind"),
        F.col("vec_id").alias("k"),
        F.col("label"),
    )
    mix = weighted_sample(
        d, "doc_id", "source", MIX_FRACTIONS, MIX_DEFAULT
    ).select(
        F.lit("mix").alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    spl = split_train_val_test(d, "doc_id", SPLIT_VAL, SPLIT_TEST).select(
        F.concat(F.lit("split_"), F.col("split")).alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    bud = token_budget_sample(
        d.select(
            "doc_id", "source",
            F.size(F.split("text", r"\s+")).alias("_tok"),
        ),
        "doc_id", "source", "_tok", BUDGET_TOKENS,
    ).select(
        F.lit("budget").alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    temp = temperature_sample(
        d, "doc_id", "source", alpha=0.5, total_budget=TEMP_BUDGET
    ).select(
        F.lit("temp").alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    pairs = minhash_near_duplicates(
        d, "doc_id", "text", n=3, num_perm=NUM_PERM, bands=BANDS,
        threshold_pct=JACCARD_PCT,
    )
    clusters = dedup_clusters(
        d, pairs.select("id_a", "id_b"), "doc_id"
    ).select(F.col("doc_id").alias("id"), "cluster_id")
    csp = split_by_cluster(
        d, "doc_id", clusters, SPLIT_VAL, SPLIT_TEST
    ).select(
        F.concat(F.lit("csplit_"), F.col("split")).alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    ep = epoch_upsample(
        d.select("doc_id", "source"), "doc_id", "source",
        EPOCHS, EPOCH_DEFAULT,
    ).select(
        F.lit("epoch").alias("kind"),
        F.col("doc_id").alias("k"),
        F.col("epoch").cast("int").alias("label"),
    )
    return (
        bern.unionByName(strat)
        .unionByName(mix)
        .unionByName(spl)
        .unionByName(bud)
        .unionByName(temp)
        .unionByName(csp)
        .unionByName(ep)
    )


QUERIES = {"samp_pack": samp_pack}

# template with a {key} placeholder; salt is '' so the hashed string is
# exactly coalesce(cast(key), sentinel), matching operators/sampling.py
_KEY_HASH = duck_md5_long(
    f"coalesce(CAST({{key}} AS VARCHAR), '{NULL_KEY_SENTINEL}')", 15
)


def key_hash_sql(key: str) -> str:
    """DuckDB replay of operators/sampling._key_hash (salt '') over any
    key expression — shared with the composed-curation oracle so the
    mixture-membership decision has exactly one SQL rendering."""
    return _KEY_HASH.format(key=key)

_MIX_WHEN = "\n                  ".join(
    f"WHEN '{g}' THEN {int(f * HASH_SPACE)}"
    for g, f in sorted(MIX_FRACTIONS.items())
)

_BUDGET_WHEN = " ".join(
    f"WHEN '{g}' THEN {b}" for g, b in sorted(BUDGET_TOKENS.items())
)

# epoch arm: full-copy counts and fractional-copy thresholds rendered
# from the SAME constants the Spark CASE embeds (operators/sampling.
# epoch_upsample uses int(floor(e)) / int(frac(e) * HASH_SPACE))
_EPOCH_FULL_WHEN = " ".join(
    f"WHEN '{g}' THEN {int(_math.floor(e))}"
    for g, e in sorted(EPOCHS.items())
)
_EPOCH_FRAC_WHEN = " ".join(
    f"WHEN '{g}' THEN {int((e - _math.floor(e)) * HASH_SPACE)}"
    for g, e in sorted(EPOCHS.items())
)
_EPOCH_FULL_ELSE = int(_math.floor(EPOCH_DEFAULT))
_EPOCH_FRAC_ELSE = int((EPOCH_DEFAULT - _math.floor(EPOCH_DEFAULT)) * HASH_SPACE)

ORACLE = {
    "samp_pack": f"""
        WITH RECURSIVE {_minhash_pairs_sql()},
        {components_ctes()}
        SELECT 'bernoulli' AS kind, doc_id AS k, CAST(NULL AS INTEGER) AS label
        FROM documents
        WHERE {_KEY_HASH.format(key="doc_id")} < {SAMPLE_THRESHOLD}
        UNION ALL
        SELECT 'stratified', vec_id, label
        FROM (
            SELECT vec_id, label,
                   row_number() OVER (
                       PARTITION BY label
                       ORDER BY {_KEY_HASH.format(key="vec_id")} % {MERSENNE31},
                                vec_id
                   ) AS rk
            FROM embeddings
        )
        WHERE rk <= {STRAT_N}
        UNION ALL
        SELECT 'mix', doc_id, CAST(NULL AS INTEGER)
        FROM documents
        WHERE {_KEY_HASH.format(key="doc_id")} <
              CASE source
                  {_MIX_WHEN}
                  ELSE {int(MIX_DEFAULT * HASH_SPACE)}
              END
        UNION ALL
        SELECT 'split_' || (CASE WHEN h < {SPLIT_VAL_T} THEN 'val'
                                 WHEN h < {SPLIT_TEST_T} THEN 'test'
                                 ELSE 'train' END),
               doc_id, CAST(NULL AS INTEGER)
        FROM (
            SELECT doc_id, {_KEY_HASH.format(key="doc_id")} AS h
            FROM documents
        )
        UNION ALL
        SELECT 'budget', doc_id, CAST(NULL AS INTEGER)
        FROM (
            SELECT doc_id, source,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tok AS cum_before
            FROM (
                SELECT doc_id, source,
                       len(regexp_split_to_array(text, '\\s+')) AS n_tok,
                       {_KEY_HASH.format(key="doc_id")} AS h
                FROM documents
            )
        )
        WHERE cum_before < CASE source {_BUDGET_WHEN} ELSE 0 END
        UNION ALL
        SELECT 'temp', doc_id, CAST(NULL AS INTEGER)
        FROM documents d
        JOIN (
            SELECT tw.source,
                   CAST(floor(
                       least(1.0,
                             ({TEMP_BUDGET} * (tw.w / tn.wsum)) / tw.n)
                       * {float(HASH_SPACE)}) AS BIGINT) AS thr
            FROM (SELECT source, count(*) AS n, sqrt(count(*)) AS w
                  FROM documents WHERE source IS NOT NULL
                  GROUP BY source) tw,
                 (SELECT list_reduce(
                             list_transform(
                                 list_sort(list(
                                     struct_pack(s := source, w := w))),
                                 x -> x.w),
                             (a, b) -> a + b) AS wsum
                  FROM (SELECT source, sqrt(count(*)) AS w
                        FROM documents WHERE source IS NOT NULL
                        GROUP BY source)) tn
        ) r USING (source)
        WHERE {_KEY_HASH.format(key="doc_id")} < r.thr
        UNION ALL
        SELECT 'csplit_' || (CASE WHEN ch < {SPLIT_VAL_T} THEN 'val'
                                  WHEN ch < {SPLIT_TEST_T} THEN 'test'
                                  ELSE 'train' END),
               doc_id, CAST(NULL AS INTEGER)
        FROM (
            SELECT d.doc_id,
                   {_KEY_HASH.format(
                       key="coalesce(c.component, d.doc_id)"
                   )} AS ch
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        )
        UNION ALL
        SELECT 'epoch', doc_id, CAST(u AS INTEGER)
        FROM (
            SELECT doc_id,
                   unnest(range(
                       CASE source {_EPOCH_FULL_WHEN}
                            ELSE {_EPOCH_FULL_ELSE} END
                       + CASE WHEN {_KEY_HASH.format(key="doc_id")} <
                             CASE source {_EPOCH_FRAC_WHEN}
                                  ELSE {_EPOCH_FRAC_ELSE} END
                         THEN 1 ELSE 0 END
                   )) AS u
            FROM documents
        )
    """,
}
