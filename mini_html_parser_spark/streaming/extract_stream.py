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
