"""Deduplication queries over the documents/embeddings tables (extension
surface): exact hash dedup, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine near-dup, and connected-components clustering.

Every query has a full DuckDB oracle. The sketch queries (MinHash, SimHash,
banded sign-LSH) use the engine-portable md5 hash family
(functions/porthash.py), so the oracle REPLAYS the sketch bit-for-bit —
signatures, banding, bucket caps, candidate pairs, verification — instead
of settling for a rows-only check. The oracle SQL below is generated
programmatically from the same constants the Spark plans embed.

Scale notes: dedup_jaccard_pairs is the EXACT path — since its round-3
upgrade to AllPairs/PPJoin prefix filtering (operators/shingles.py) the
candidate join touches only each document's rarest few shingles, so it is
a registered scale path alongside the approximate sketches: minhash
(text) and banded sign-LSH (embeddings) remain the cheaper routes when
estimated similarity suffices, and the clustering query consumes MinHash
edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.porthash import (
    MERSENNE31,
    duck_sign_bucket,
    perm_coefficients,
)
from ..operators.minhash import DEFAULT_MAX_BUCKET, minhash_near_duplicates
from ..operators.decontaminate import contamination_containment
from ..operators.shingles import jaccard_pairs
from ..operators.simhash import BITS as SIMHASH_BITS
from ..operators.simhash import BAND_BLOCKS, BLOCK_BITS, BLOCK_MASK
from ..operators.simhash import simhash_near_duplicates
from ..operators.similarity import cosine_pairs_bucketed
from ..operators.xplode import explode_nonempty
from ..sources.parquet import load_table

JACCARD_PCT = 20  # word-trigram Jaccard >= 0.20 => near-duplicate
COSINE_THRESHOLD = 0.4  # synthetic 64-d embeddings: max off-diag cos ~0.51
NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS
COS_TABLES = 4
COS_PLANES = 8
EMB_DIM = 64


DECON_N = 8  # the standard 8-gram contamination rule
DECON_BENCH_MOD = 100  # doc_id % 100 == 0 plays the "benchmark" set
DECON_CONTAIN_PCT = 50  # containment rule: >=50% of a bench item's 8-grams

PR_ITERS = 5  # pagerank arm: fixed rounds -> fixed shuffle budget + an
PR_DAMPING = 0.85  # unrollable oracle (the BPE-loop precedent)


def dedup_exact_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact-text-overlap operators union-tagged into one slot:

    'exact' rows — exact dedup by content hash, one representative (min
    id) per md5; hash-groupBy is one shuffle on the digest, the
    100 TB-safe exact path.

    'decon' rows — benchmark decontamination audit
    (operators/decontaminate.py): every (doc, benchmark-doc) pair
    sharing >= 1 word 8-gram, where doc_id % DECON_BENCH_MOD == 0 plays
    the benchmark set. Benchmark shingles broadcast; corpus side is one
    linear shingle scan.

    'contain' rows — the NORMALIZED contamination rule
    (contamination_containment): pairs where >= DECON_CONTAIN_PCT
    percent of the benchmark item's distinct 8-grams appear in the doc;
    n carries the floor containment percentage (integer cross-multiply
    decision, no float division).
    """
    d = load_table(spark, sf_dir, "documents")
    exact = (
        d.withColumn("key", F.md5(F.encode(F.col("text"), "UTF-8")))
        .groupBy("key")
        .agg(
            F.min("doc_id").alias("a"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("exact").alias("kind"),
            "key",
            "a",
            F.lit(None).cast("bigint").alias("b"),
            "n",
        )
    )
    bench = d.filter(F.col("doc_id") % DECON_BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    # ONE shingle-scan + broadcast-join + count subplan feeds BOTH arms:
    # at pct=0 contamination_containment returns every >=1-shared-gram
    # pair (== contamination_hits), and each hit row fans to its 'decon'
    # row plus, when the cross-multiply passes, its 'contain' row.
    hits = contamination_containment(
        d, bench, n=DECON_N, min_containment_pct=0
    )
    arm_structs = F.array_compact(
        F.array(
            F.struct(
                F.lit("decon").alias("kind"), F.col("n_shared").alias("n")
            ),
            F.when(
                F.col("n_shared") * 100
                >= F.lit(DECON_CONTAIN_PCT) * F.col("n_bench"),
                F.struct(
                    F.lit("contain").alias("kind"),
                    F.col("containment_pct").alias("n"),
                ),
            ),
        )
    )
    decon_contain = explode_nonempty(
        hits.select("id", "bench_id", arm_structs.alias("_arms")),
        ["id", "bench_id"], "_arms", "arm",
    ).select(
        F.col("arm.kind").alias("kind"),
        F.lit(None).cast("string").alias("key"),
        F.col("id").alias("a"),
        F.col("bench_id").alias("b"),
        F.col("arm.n").alias("n"),
    )
    return exact.unionByName(decon_contain)


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (operators/shingles.py)
    — zero false negatives, scale-safe since the AllPairs/PPJoin prefix
    filter: candidates come from a self-join restricted to each document's
    first n - ceil(t*n) + 1 rarest-first shingles (any pair at or above
    the threshold provably shares a prefix shingle), and full-intersection
    verification touches candidates only. Same integer Jaccard test as
    minhash verification, so the two paths are directly comparable."""
    d = load_table(spark, sf_dir, "documents")
    # cache_shingles: the shingle-array and prefix subtrees feed 4 and 2
    # consumers respectively (r11 plan audit: six scans of the corpus,
    # four shingle explodes in one query) — persisting them is the
    # operator docstring's own 100 TB advice; values unchanged.
    return jaccard_pairs(
        d, "doc_id", "text", n=3, threshold_pct=JACCARD_PCT,
        cache_shingles=True,
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms)+LSH(8 bands) candidates verified by exact Jaccard
    (operators/minhash.py), buckets capped at DEFAULT_MAX_BUCKET. Full
    oracle: DuckDB replays the identical md5-family sketch."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, "doc_id", "text", n=3, num_perm=NUM_PERM, bands=BANDS,
        threshold_pct=JACCARD_PCT,
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 near-dup pairs with Hamming <= 3 (operators/simhash.py):
    20 Manku band probes (30-bit keys), buckets capped at
    DEFAULT_MAX_BUCKET. Full oracle: DuckDB recomputes the identical
    fingerprints, probes, and cap."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(d, "doc_id", "text", max_hamming=3)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH buckets + exact cosine
    verification (operators/similarity.py cosine_pairs_bucketed) — the
    scale path: linear scan, per-bucket joins, candidates only.

    Threshold 0.4 fits the synthetic embeddings (max off-diagonal cosine
    ~0.51); real corpora use ~0.95, where banded-LSH recall is high. The
    all-pairs exact form stays available as cosine_pairs for recall
    tests."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_bucketed(
        e, "vec_id", "embedding", dim=EMB_DIM, threshold=COSINE_THRESHOLD,
        tables=COS_TABLES, planes_per_table=COS_PLANES,
        max_bucket_size=DEFAULT_MAX_BUCKET,
    )


NEW_BATCH_MOD = 10  # doc_id % 10 == 0 plays the "today's increment" batch
XCORP_MOD = 5  # the synthetic recrawl slice for the cross-corpus audit:
XCORP_REM = 3  # corpus B = documents with doc_id % 5 == 3, text unchanged


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-store minhash pack, union-tagged (registry-slot
    fold, r8).

    'incr' rows — incremental near-dup candidates: the daily-increment
    shape that matters at 100 TB. Documents split deterministically
    into a STORED corpus (doc_id % 10 != 0, already sketched into a
    persistable (id, band, bucket) signature store) and a NEW batch
    (doc_id % 10 == 0); candidates come from new x stored bucket joins
    against the store plus new x new — never stored x stored
    (operators/minhash.py:138-198). Equals the full-recompute candidate
    set restricted to pairs involving at least one new id (the bucket
    cap applies to the COMBINED bucket population, identical to the
    one-shot path), which is exactly what the DuckDB oracle replays.
    Candidates only — n_inter/n_union/jaccard ride NULL (bigint/double
    NULLs have green precedent; NULL boolean is the forbidden type).

    'xcorp' rows (r8) — cross_corpus_near_duplicates
    (operators/minhash.py): the fuzzy-decontamination A x B audit.
    Corpus A = documents, corpus B = a fixed synthetic recrawl slice
    (doc_id % 5 == 3 — the XCORP_MOD/XCORP_REM constants — with text
    unchanged: identity recrawls pair at jaccard 1.0, near-dups at
    their true score). Both
    sides sketch independently, banded rows union with a side tag into
    the shared capped one-shuffle bucket expansion, CROSS-side pairs
    only (never within-side), exact-Jaccard verified. The oracle
    replays the two-sided sketch with the combined-population bucket
    cap."""
    from ..operators.minhash import (
        cross_corpus_near_duplicates,
        incremental_candidate_pairs,
        minhash_signature_store,
    )

    d = load_table(spark, sf_dir, "documents")
    new_docs = d.filter(F.col("doc_id") % NEW_BATCH_MOD == 0)
    stored_docs = d.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
    stored = minhash_signature_store(
        stored_docs, "doc_id", "text", n=3, num_perm=NUM_PERM, bands=BANDS
    )
    new_banded = minhash_signature_store(
        new_docs, "doc_id", "text", n=3, num_perm=NUM_PERM, bands=BANDS
    )
    incr_rows = incremental_candidate_pairs(
        new_banded, stored, max_bucket_size=DEFAULT_MAX_BUCKET
    ).select(
        F.lit("incr").alias("arm"),
        "id_a",
        "id_b",
        F.lit(None).cast("bigint").alias("n_inter"),
        F.lit(None).cast("bigint").alias("n_union"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    recrawl = d.filter(F.col("doc_id") % XCORP_MOD == XCORP_REM)
    x_rows = cross_corpus_near_duplicates(
        d, recrawl, "doc_id", "text", n=3, num_perm=NUM_PERM,
        bands=BANDS, threshold_pct=JACCARD_PCT,
        max_bucket_size=DEFAULT_MAX_BUCKET,
    ).select(
        F.lit("xcorp").alias("arm"),
        "id_a",
        "id_b",
        "n_inter",
        "n_union",
        "jaccard",
    )
    return incr_rows.unionByName(x_rows)


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph pack: the iterative graph operators, union-tagged —
    'component' (full near-dup clustering), 'pagerank', and 'incr'
    (r8: incremental component maintenance, the production shape).

    'component' rows — near-dup clustering: transitive closure over the
    MINHASH near-dup edges (the scale-safe edge set) via alternating
    large-star/small-star contraction (operators/components.py —
    O(log n) rounds on any graph shape, so an adversarial chain in the
    edges cannot blow the round count; pinned result-identical to
    min-label propagation). Every doc gets cluster_id = min doc_id in
    component; the keeper flag is derivable (node = cluster_id) and is
    NOT carried — a NULL boolean is the one type the engines' pandas
    bridges disagree on (None vs NaN in an object column), while NULL
    BIGINT/DOUBLE have green precedent (dedup_exact_pack's b column).
    Oracle: recursive CTE reachability over the replayed minhash pairs.

    'pagerank' rows — operators/pagerank.py over a deterministic
    synthetic link graph on the doc ids (one or two out-links per
    non-dangling doc depending on doc_id % 3, every third doc dangling
    — the tests/test_pagerank.py parity graph), PR_ITERS rounds. rank_scaled = round(rank * n_docs, 6):
    scaling to ~1.0 before rounding pins ~6 significant figures while
    leaving ~7 orders of margin over the cross-engine FP summation
    noise (~1e-13 abs — the r6 float-determinism recipe; exact-decimal
    folds are impossible for 1/n seeds, so this arm rounds like the
    cosine arms do). Oracle: unrolled MATERIALIZED CTE chain rendered
    from the same constants (the BPE-loop precedent)."""
    from ..operators.components import (
        dedup_clusters,
        incremental_components,
    )
    from ..operators.pagerank import pagerank

    d = load_table(spark, sf_dir, "documents")
    # one-row aggregate -> driver SCALAR (n_docs feeds the edge moduli
    # and the rank scaling) — bounded, never data-sized, the same
    # contract as pagerank's own per-round dangling-mass collect; a
    # crossJoin scalar attach would put a BroadcastNestedLoopJoin in a
    # plan the no-theta-join hygiene test pins clean
    n_docs = d.count()

    # eager checkpoint: the pair set is tiny (near-dup pairs, not the
    # corpus) and is traversed by the comp/incr arms below — a live
    # minhash plan would re-run the sketch build per traversal. Built
    # INSIDE the graph-family worker (r11): pagerank's synthetic link
    # graph does not read the pair set, so the ~2s sketch build now
    # overlaps the pagerank loop instead of serializing ahead of all
    # three arms (phase profile in PERFORMANCE.md r11 — the row's wall
    # was pairs + max(arms), now max(pagerank, pairs + max(comp,
    # incr))). The checkpoint is materialized before the two dependent
    # arms start, so no concurrent first-touch can recompute it.
    def _pairs():
        return minhash_near_duplicates(
            d, "doc_id", "text", n=3, num_perm=NUM_PERM, bands=BANDS,
            threshold_pct=JACCARD_PCT,
        ).localCheckpoint(eager=True)

    # The arms are independent chains over the checkpointed pair set
    # (and d's cached scan), and each runs a DRIVER-PACED iterative
    # loop (contraction rounds / pagerank rounds) whose per-round jobs
    # underfill the cluster — so they run on a thread pool (the
    # cur_train_pack / ann_pq_pack precedent; measured 17 -> see
    # PERFORMANCE.md r9).
    def _comp(pairs):
        return dedup_clusters(
            d, pairs.select("id_a", "id_b"), "doc_id"
        ).select(
            F.lit("component").alias("arm"),
            F.col("doc_id").alias("node"),
            "cluster_id",
            F.lit(None).cast("double").alias("rank_scaled"),
        )

    def _pr():
        edges = d.filter(F.col("doc_id") % 3 != 0).select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 1) % n_docs).alias("dst"),
        ).unionAll(
            d.filter(F.col("doc_id") % 3 == 1).select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * 13 + 3) % n_docs).alias("dst"),
            )
        )
        return pagerank(
            edges, iterations=PR_ITERS, damping=PR_DAMPING
        ).select(
            F.lit("pagerank").alias("arm"),
            "node",
            F.lit(None).cast("bigint").alias("cluster_id"),
            F.round(F.col("rank") * n_docs, 6).alias("rank_scaled"),
        )

    # 'incr' rows (r8): the INCREMENT is what a 100 TB dedup store
    # actually runs — you never recontract history. Split the near-dup
    # edges deterministically in two, cluster batch 1, fold batch 2
    # into the stored labels (operators/components.incremental_
    # components: old labels re-enter as depth-1 star edges); the
    # oracle is the FULL recompute over the union, which the increment
    # must equal exactly.
    def _incr(pairs):
        p1 = pairs.filter((F.col("id_a") + F.col("id_b")) % 2 == 0)
        p2 = pairs.filter((F.col("id_a") + F.col("id_b")) % 2 == 1)
        stored = dedup_clusters(
            d, p1.select("id_a", "id_b"), "doc_id"
        ).select(
            F.col("doc_id").alias("id"),
            F.col("cluster_id").alias("component"),
        )
        return incremental_components(
            stored, p2.select("id_a", "id_b")
        ).select(
            F.lit("incr").alias("arm"),
            F.col("id").alias("node"),
            F.col("component").alias("cluster_id"),
            F.lit(None).cast("double").alias("rank_scaled"),
        )

    # InheritableThread workers, not a pool: pooled threads never run
    # the pinned-JVM-thread cleanup (see parallel.run_parallel).
    # Two top-level workers: the pagerank loop, and the pair-dependent
    # graph family (pairs checkpoint, then comp/incr on a nested pair
    # of workers — InheritableThread inherits the session context, so
    # nesting is safe and the two contraction loops overlap too).
    from ..parallel import run_parallel

    def _graph_family():
        pairs = _pairs()
        sub, _ = run_parallel({
            "comp": lambda: _comp(pairs),
            "incr": lambda: _incr(pairs),
        })
        return sub

    done, _ = run_parallel({"graph": _graph_family, "pr": _pr})
    return (
        done["graph"]["comp"]
        .unionByName(done["pr"])
        .unionByName(done["graph"]["incr"])
    )


# dedup_jaccard_pairs re-entered the registry in round 4: the round-3
# prefix-filter upgrade (AllPairs) made the exact path scale-safe, so all
# five dedup families from the brief (exact, jaccard, minhash, simhash,
# embedding-cosine) now carry driver rows. The slot came from folding the
# two windowed streaming queries into stream_window_pack.
QUERIES = {
    "dedup_exact_pack": dedup_exact_pack,
    "dedup_jaccard_pairs": dedup_jaccard_pairs,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_incremental_minhash": dedup_incremental_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_connected_components": dedup_connected_components,
}

# ---------------------------------------------------------------------------
# Oracle SQL (generated from the same constants the Spark plans embed)
# ---------------------------------------------------------------------------

def _duck_shingles(rel: str = "documents", id_col: str = "doc_id") -> str:
    """Word-trigram shingle CTE body over any (id, text) relation; the
    emitted id column is always named doc_id so downstream fragments
    compose identically for the base corpus and derived corpora (the
    composed-curation oracle reuses this over its scrubbed CTE)."""
    return f"""
    SELECT {id_col} AS doc_id,
           unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
    FROM (SELECT {id_col}, regexp_split_to_array(text, '\\s+') AS t
          FROM {rel})
    WHERE len(t) >= 3
"""


_DUCK_SHINGLES = _duck_shingles()

_DUCK_MD5_8 = "CAST(CONCAT('0x', substr(md5({s}), 1, 8)) AS BIGINT)"
_DUCK_MD5_15 = "CAST(CONCAT('0x', substr(md5({s}), 1, 15)) AS BIGINT)"


def _minhash_cand_sql(rel: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB CTE chain replaying minhash candidate generation exactly
    (shingles -> signatures -> banding -> capped buckets -> cand)."""
    perms = perm_coefficients(NUM_PERM)
    sig_cols = ",\n               ".join(
        f"min((CAST({a} AS BIGINT) * x + {b}) % {MERSENNE31}) AS h{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_arms = "\n            UNION ALL\n            ".join(
        "SELECT id, {b} AS band, concat_ws('_', {cols}) AS bucket FROM sig".format(
            b=b,
            cols=", ".join(
                f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    x = _DUCK_MD5_8.format(s="shingle")
    return f"""
        sh AS ({_duck_shingles(rel, id_col)}),
        shi AS (SELECT doc_id AS id, {x} % {MERSENNE31} AS x FROM sh),
        sig AS (SELECT id,
               {sig_cols}
            FROM shi GROUP BY id),
        bands AS (
            {band_arms}
        ),
        kept AS (SELECT band, bucket FROM bands
                 GROUP BY band, bucket HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
        bk AS (SELECT bands.id, bands.band, bands.bucket
               FROM bands JOIN kept USING (band, bucket)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM bk a JOIN bk b
                   ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)"""


def _minhash_pairs_sql(rel: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB CTE chain replaying minhash_near_duplicates exactly
    (candidates + exact-Jaccard verification)."""
    return f"""{_minhash_cand_sql(rel, id_col)},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.id_a, c.id_b, count(*) AS n_inter
            FROM cand c
            JOIN sh a ON a.doc_id = c.id_a
            JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
            GROUP BY c.id_a, c.id_b
        ),
        mh_pairs AS (
            SELECT id_a, id_b, n_inter,
                   sa.n_sh + sb.n_sh - n_inter AS n_union,
                   n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter * 100 >= {JACCARD_PCT} * (sa.n_sh + sb.n_sh - n_inter)
        )"""


def _xcorp_pairs_sql() -> str:
    """DuckDB CTE chain replaying cross_corpus_near_duplicates exactly:
    corpus A = documents, corpus B = the fixed recrawl slice; each side
    shingles + sketches independently, banded rows union with a side
    tag, the bucket cap applies to the COMBINED population, candidates
    are CROSS-side only (id_a from A, id_b from B), exact-Jaccard
    verified against each side's own shingle table. xsig/xsha/xshb are
    MATERIALIZED: the band arms reference xsig 8 times and the verify
    stage re-reads both shingle tables — DuckDB inlines CTEs, so an
    unmaterialized chain re-expands the whole sketch per reference."""
    perms = perm_coefficients(NUM_PERM)
    sig_cols = ",\n               ".join(
        f"min((CAST({a} AS BIGINT) * x + {b}) % {MERSENNE31}) AS h{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_arms = "\n            UNION ALL\n            ".join(
        "SELECT is_a, id, {b} AS band, concat_ws('_', {cols}) AS bucket"
        " FROM xsig".format(
            b=b,
            cols=", ".join(
                f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(BANDS)
    )
    x = _DUCK_MD5_8.format(s="shingle")
    return f"""
        rb AS (SELECT doc_id, text FROM documents
               WHERE doc_id % {XCORP_MOD} = {XCORP_REM}),
        xsha AS MATERIALIZED ({_duck_shingles("documents")}),
        xshb AS MATERIALIZED ({_duck_shingles("rb")}),
        xshi AS (SELECT TRUE AS is_a, doc_id AS id,
                        {x} % {MERSENNE31} AS x
                 FROM xsha
                 UNION ALL
                 SELECT FALSE, doc_id, {x} % {MERSENNE31} FROM xshb),
        xsig AS MATERIALIZED (SELECT is_a, id,
               {sig_cols}
            FROM xshi GROUP BY is_a, id),
        xbands AS (
            {band_arms}
        ),
        xkept AS (SELECT band, bucket FROM xbands
                  GROUP BY band, bucket
                  HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
        xbk AS (SELECT xbands.is_a, xbands.id, xbands.band, xbands.bucket
                FROM xbands JOIN xkept USING (band, bucket)),
        xcand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                  FROM xbk a JOIN xbk b
                    ON a.band = b.band AND a.bucket = b.bucket
                   AND a.is_a AND NOT b.is_a),
        xsizea AS (SELECT doc_id, count(*) AS n_sh FROM xsha
                   GROUP BY doc_id),
        xsizeb AS (SELECT doc_id, count(*) AS n_sh FROM xshb
                   GROUP BY doc_id),
        xinter AS (
            SELECT c.id_a, c.id_b, count(*) AS n_inter
            FROM xcand c
            JOIN xsha a ON a.doc_id = c.id_a
            JOIN xshb b ON b.doc_id = c.id_b AND b.shingle = a.shingle
            GROUP BY c.id_a, c.id_b
        ),
        xpairs AS (
            SELECT id_a, id_b, n_inter,
                   sa.n_sh + sb.n_sh - n_inter AS n_union,
                   n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
            FROM xinter
            JOIN xsizea sa ON sa.doc_id = id_a
            JOIN xsizeb sb ON sb.doc_id = id_b
            WHERE n_inter * 100 >= {JACCARD_PCT}
                                   * (sa.n_sh + sb.n_sh - n_inter)
        )"""


def _simhash_sql() -> str:
    """DuckDB CTE chain replaying simhash_near_duplicates exactly:
    fingerprints, the 20 Manku band probes (every 3-subset of the 6
    10-bit blocks, concatenated low-to-high — rendered from the SAME
    BAND_BLOCKS constant the Spark operator enumerates), and the
    bucket cap. fp/bands are MATERIALIZED: DuckDB inlines CTEs, and fp
    is referenced once per band arm (20x the fingerprint aggregation
    without it)."""
    h = _DUCK_MD5_15.format(s="tok")
    bit_sums = ",\n               ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = "\n                 + ".join(
        f"(CASE WHEN b{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    band_arms = "\n            UNION ALL\n            ".join(
        f"SELECT id, simhash, {t} AS band, "
        + " | ".join(
            f"(((simhash >> {blk * BLOCK_BITS}) & {BLOCK_MASK})"
            f" << {pos * BLOCK_BITS})"
            for pos, blk in enumerate(blocks)
        )
        + " AS val FROM fp"
        for t, blocks in enumerate(BAND_BLOCKS)
    )
    return f"""
        toks AS (SELECT doc_id AS id,
                        unnest(regexp_split_to_array(text, '\\s+')) AS tok
                 FROM documents),
        th AS (SELECT id, {h} AS h FROM toks),
        bs AS (SELECT id,
               {bit_sums}
            FROM th GROUP BY id),
        fp AS MATERIALIZED (SELECT id,
                 {fp}
               AS simhash FROM bs),
        sbands AS MATERIALIZED (
            {band_arms}
        ),
        skept AS (SELECT band, val FROM sbands
                  GROUP BY band, val
                  HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
        sbk AS (SELECT sbands.id, sbands.simhash, sbands.band, sbands.val
                FROM sbands JOIN skept USING (band, val))"""


def components_ctes() -> str:
    """edges/reach/comp CTE bodies over ``mh_pairs`` (compose after
    :func:`_minhash_pairs_sql` inside one WITH RECURSIVE): ``comp`` is
    (id, component = min reachable id). ONE rendering shared by the
    dedup_connected_components oracle and samp_pack's leakage-safe
    cluster-split arm (queries/sampling_q.py)."""
    return """edges AS (
            SELECT id_a AS u, id_b AS v FROM mh_pairs
            UNION
            SELECT id_b, id_a FROM mh_pairs
        ),
        reach(id, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
        ),
        comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)"""


def pagerank_unrolled_ctes(
    n_iter: int, damping: float, edges_rel: str
) -> str:
    """CTE bodies (no WITH) unrolling ``n_iter`` damped power-iteration
    rounds over ``edges_rel`` (src, dst); pr_r{n_iter} is (node, deg,
    rank). MATERIALIZED throughout: DuckDB inlines CTEs and every round
    references its predecessor twice (contributions + dangling mass), so
    an inlined chain re-expands the whole prefix per reference. Shared
    with tests/test_pagerank.py so the pytest twin and the driver-gate
    oracle render ONE chain."""
    ctes = [
        f"""pr_e AS MATERIALIZED (SELECT DISTINCT src AS u, dst AS v
                FROM {edges_rel}
                WHERE src IS NOT NULL AND dst IS NOT NULL),
        pr_nodes AS MATERIALIZED (
            SELECT DISTINCT node FROM (
                SELECT u AS node FROM pr_e UNION SELECT v FROM pr_e)),
        pr_nn AS MATERIALIZED (SELECT count(*) AS n FROM pr_nodes),
        pr_base AS MATERIALIZED (
            SELECT node, deg FROM pr_nodes LEFT JOIN (
                SELECT u AS node, count(*) AS deg FROM pr_e GROUP BY 1)
            USING (node)),
        pr_r0 AS MATERIALIZED (
            SELECT node, deg,
                   CAST(1.0 AS DOUBLE) / (SELECT n FROM pr_nn) AS rank
            FROM pr_base)"""
    ]
    for k in range(1, n_iter + 1):
        p = k - 1
        ctes.append(f"""pr_r{k} AS MATERIALIZED (
            SELECT b.node, b.deg,
                   (1 - {damping}) / (SELECT n FROM pr_nn)
                   + {damping} * (coalesce(c._c, 0)
                       + coalesce((SELECT sum(rank) FROM pr_r{p}
                                   WHERE deg IS NULL), 0)
                         / (SELECT n FROM pr_nn)) AS rank
            FROM pr_base b LEFT JOIN (
                SELECT pr_e.v AS node, sum(r.rank / r.deg) AS _c
                FROM pr_r{p} r JOIN pr_e ON r.node = pr_e.u
                GROUP BY pr_e.v) c
            USING (node))""")
    return ",\n        ".join(ctes)


def _cosine_bucketed_sql() -> str:
    """Replays lsh_banded_pairs INCLUDING the bucket-size cap (a bucket
    with more than DEFAULT_MAX_BUCKET members is dropped on both
    engines)."""
    arms = "\n            UNION ALL\n            ".join(
        f"SELECT vec_id, {t} AS tbl,\n                 "
        + duck_sign_bucket(EMB_DIM, t * COS_PLANES, COS_PLANES)
        + "\n               AS bucket FROM v"
        for t in range(COS_TABLES)
    )
    return f"""
        v AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
              FROM embeddings),
        banded AS (
            {arms}
        ),
        ckept AS (SELECT tbl, bucket FROM banded
                  GROUP BY tbl, bucket
                  HAVING count(*) <= {DEFAULT_MAX_BUCKET}),
        cbk AS (SELECT banded.vec_id, banded.tbl, banded.bucket
                FROM banded JOIN ckept USING (tbl, bucket)),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM cbk a JOIN cbk b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket
                  AND a.vec_id < b.vec_id),
        n AS (SELECT vec_id, vv,
                     sqrt(list_sum(list_transform(vv, x -> x * x))) AS nrm
              FROM v)"""


# Exact-Jaccard oracle: DuckDB verifies with the straightforward all-pairs
# shingle join (fine at oracle scale) — the Spark side must produce the
# IDENTICAL pair set through the prefix filter, which is exactly the
# zero-false-negative claim the AllPairs theorem makes.
JACCARD_PAIRS_ORACLE = f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
           sa.n_sh + sb.n_sh - n_inter AS n_union,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter * 100 >= {JACCARD_PCT} * (sa.n_sh + sb.n_sh - n_inter)
"""

_DECON_CAT = " || ' ' || ".join(f"t[i+{j}]" for j in range(DECON_N))
_DECON_SHINGLES = f"""
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, len(t) - {DECON_N - 2}),
               i -> {_DECON_CAT}))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
          FROM documents)
    WHERE len(t) >= {DECON_N}
"""

ORACLE = {
    "dedup_jaccard_pairs": JACCARD_PAIRS_ORACLE,
    "dedup_exact_pack": f"""
        WITH ds AS MATERIALIZED ({_DECON_SHINGLES}),
        bs AS MATERIALIZED (
            SELECT doc_id AS bench_id, shingle FROM ds
            WHERE doc_id % {DECON_BENCH_MOD} = 0
        ),
        bn AS (SELECT bench_id, count(*) AS n_bench FROM bs GROUP BY bench_id),
        ch AS MATERIALIZED (
            SELECT c.doc_id AS a, b.bench_id, count(*) AS n_shared
            FROM ds c JOIN bs b USING (shingle)
            GROUP BY c.doc_id, b.bench_id
        )
        SELECT 'exact' AS kind, md5(text) AS key, min(doc_id) AS a,
               CAST(NULL AS BIGINT) AS b, count(*) AS n
        FROM documents GROUP BY md5(text)
        UNION ALL
        SELECT 'decon', CAST(NULL AS VARCHAR), a, bench_id, n_shared
        FROM ch
        UNION ALL
        SELECT 'contain', CAST(NULL AS VARCHAR), a, bench_id,
               (100 * n_shared) // n_bench
        FROM ch JOIN bn USING (bench_id)
        WHERE n_shared * 100 >= {DECON_CONTAIN_PCT} * n_bench
    """,
    "dedup_minhash_lsh": f"""
        WITH {_minhash_pairs_sql()}
        SELECT id_a, id_b, n_inter, n_union, jaccard FROM mh_pairs
    """,
    "dedup_incremental_minhash": f"""
        WITH {_minhash_cand_sql()},
        {_xcorp_pairs_sql()}
        SELECT 'incr' AS arm, id_a, id_b,
               CAST(NULL AS BIGINT) AS n_inter,
               CAST(NULL AS BIGINT) AS n_union,
               CAST(NULL AS DOUBLE) AS jaccard
        FROM cand
        WHERE id_a % {NEW_BATCH_MOD} = 0 OR id_b % {NEW_BATCH_MOD} = 0
        UNION ALL
        SELECT 'xcorp', id_a, id_b, n_inter, n_union, jaccard
        FROM xpairs
    """,
    "dedup_simhash": f"""
        WITH {_simhash_sql()}
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sbk a JOIN sbk b
          ON a.band = b.band AND a.val = b.val AND a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "dedup_embedding_cosine": f"""
        WITH {_cosine_bucketed_sql()}
        SELECT c.id_a, c.id_b,
               round(list_dot_product(a.vv, b.vv) / (a.nrm * b.nrm), 6) AS cos
        FROM cand c
        JOIN n a ON a.vec_id = c.id_a
        JOIN n b ON b.vec_id = c.id_b
        WHERE round(list_dot_product(a.vv, b.vv) / (a.nrm * b.nrm), 6)
              >= {COSINE_THRESHOLD}
    """,
    "dedup_connected_components": f"""
        WITH RECURSIVE {_minhash_pairs_sql()},
        {components_ctes()},
        prn AS MATERIALIZED (SELECT count(*) AS n_docs FROM documents),
        predges AS MATERIALIZED (
            SELECT doc_id AS src,
                   (doc_id * 7 + 1) % (SELECT n_docs FROM prn) AS dst
            FROM documents WHERE doc_id % 3 != 0
            UNION ALL
            SELECT doc_id, (doc_id * 13 + 3) % (SELECT n_docs FROM prn)
            FROM documents WHERE doc_id % 3 = 1
        ),
        {pagerank_unrolled_ctes(PR_ITERS, PR_DAMPING, "predges")}
        SELECT 'component' AS arm, d.doc_id AS node,
               coalesce(c.component, d.doc_id) AS cluster_id,
               CAST(NULL AS DOUBLE) AS rank_scaled
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
        UNION ALL
        SELECT 'pagerank', node, CAST(NULL AS BIGINT),
               round(rank * (SELECT n_docs FROM prn), 6)
        FROM pr_r{PR_ITERS}
        UNION ALL
        -- 'incr': the Spark side folds half the edges into the other
        -- half's stored labels; the increment's contract is equality
        -- with the full recompute over the union, so the oracle IS the
        -- component reachability again, tagged
        SELECT 'incr', d.doc_id, coalesce(c.component, d.doc_id),
               CAST(NULL AS DOUBLE)
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    """,
}
