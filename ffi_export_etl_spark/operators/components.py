"""Connected components over a pair/edge list — near-duplicate CLUSTERING.

Pairwise dedup finds edges (jaccard/minhash/simhash/cosine pairs); turning
"A~B, B~C" into one keep-group requires the transitive closure. This is
the canonical iterative Spark algorithm: min-label propagation to a fixed
point.

Algorithm (alternating contraction, bounded iterations):
  label(v) <- v
  repeat: label(v) <- min(label(v), min over neighbors u of label(u))
until no label changes. Each round is one join + one aggregation; rounds
needed = graph diameter (near-dup clusters are tiny, so 3-5 rounds in
practice; ``max_iter`` guards pathological chains). At extreme scale the
large-star/small-star variant (Kiveris et al.) halves round counts; the
join shape below is the same.

The per-round convergence check is a count of changed labels — an action,
so the loop materializes each round (cached) and unpersists the previous
one; lineage stays O(1) deep instead of growing per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = min
    vertex id reachable. Edges are undirected (both directions added)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    adj = fwd.union(rev).distinct()
    adj.persist()

    labels = (
        adj.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    labels.persist()
    labels.count()

    for _ in range(max_iter):
        nbr_min = (
            adj.join(labels, adj.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    adj.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a cluster id (= min doc id of its near-dup
    component; singletons cluster to themselves) and mark the keeper."""
    comp = connected_components(pairs)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_keeper", (F.col(id_col) == F.col("cluster_id")))
    )
