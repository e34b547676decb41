"""PageRank over a link graph — crawl-frontier / source prioritization.

A web-scale curation pipeline ranks its URL frontier (and weights
sources) by link authority; PageRank is the canonical score. Input is
the edge list that ``operators/htmlx.extract_links`` + URL
canonicalization produce; output is (node, rank) summing to ~1.

Spark-first power iteration with the same discipline as
operators/components.py:

- each iteration is ONE shuffle (contributions grouped by destination);
  the dangling rank mass is attached IN-PLAN as a one-row broadcast
  (aggregate -> crossJoin — no per-round driver barrier, r10), leaving
  a single driver-side scalar for the whole run: the total node count,
  collected once before the loop (one-row aggregate, model-sized);
- the rank frame is ``localCheckpoint``-ed per round (materialize +
  truncate lineage — an iterative plan otherwise grows super-linearly
  in Catalyst) and the PREVIOUS round's blocks are freed eagerly
  (components.py _free_rdds) instead of waiting on the ContextCleaner;
- out-degrees are computed once and persisted for the loop's lifetime;
- dangling nodes (no out-links — most frontier URLs!) redistribute
  their mass uniformly each round, keeping total rank at 1 so scores
  are comparable across corpora.

Fixed iteration count (default 10) rather than convergence-delta: the
cost model at 100 TB is then exactly ``iterations`` shuffles, and a
fixed count is what makes the DuckDB oracle replayable as an unrolled
MATERIALIZED CTE chain (tests/test_pagerank.py — the BPE-loop
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _ckpt_ids, _free_rdds


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of damped power
    iteration with uniform dangling redistribution. Self-loops count
    (a page linking itself keeps mass); duplicate edges are collapsed —
    multiplicity is link spam, not authority."""
    spark = edges.sparkSession
    # Materialize the edge set ONCE (r10): it is joined every round,
    # and a live plan re-runs the scan + distinct shuffle per
    # iteration — the same entry-checkpoint discipline as
    # connected_components_alternating. Blocks are freed before
    # returning (the result is its own checkpoint).
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    ).localCheckpoint(eager=True)
    e_ids = _ckpt_ids(e)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    base = nodes.join(deg, "node", "left").persist()
    # one-row aggregate -> driver scalar (bounded, never data-sized)
    n = base.count()
    if n == 0:
        empty = base.select("node", F.lit(0.0).alias("rank")).localCheckpoint()
        base.unpersist()  # nothing cached may outlive the call
        _free_rdds(spark, e_ids)
        return empty
    ranks = base.select(
        "node", "deg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()
    prev_ids = _ckpt_ids(ranks)
    for _ in range(iterations):
        # mass parked on dangling nodes this round, redistributed
        # uniformly. Kept IN-PLAN as a one-row broadcast attach (the
        # repo's scalar-attach crossJoin pattern) rather than a driver
        # collect: the round is then ONE job (the checkpoint) instead
        # of two sequential driver round-trips — at 10 iterations that
        # halves the loop's job-submission latency, and on a cluster it
        # removes a per-round driver synchronization barrier. Both
        # traversals of `ranks` read its checkpoint blocks.
        dang = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contribs = (
            ranks.join(e, ranks["node"] == e["u"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("_c"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        ).localCheckpoint()
        cur_ids = _ckpt_ids(ranks)
        _free_rdds(spark, prev_ids)
        prev_ids = cur_ids
    base.unpersist()
    _free_rdds(spark, e_ids)
    return ranks.select("node", "rank")
