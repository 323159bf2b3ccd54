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
