"""Corpus pipeline: session, partitioning/skew policy, metrics, job.

The reference's parallelism model is one-file-one-process
(parse_natural_questions.py:57-64) which skews when one file holds
giant docs.  Here partitioning is explicit (north_rule):

* salt bucket = ``pmod(xxhash64(doc_id), n_buckets)`` — deterministic,
  resumable unit of work (the icelite manifest records buckets),
* ``n_buckets`` defaults to 4× parallelism so the giant-doc tail
  amortizes across many small tasks instead of stalling one straggler,
* Arrow batches are kept small (``maxRecordsPerBatch``) so a 2 MB doc
  doesn't blow the Python worker when 64 of them land in one batch,
* AQE stays on for post-agg stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

DEFAULT_SHUFFLE_PARTITIONS = 32
ARROW_MAX_RECORDS = 256


def build_session(
    app_name: str = "mini-html-parser-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def with_salt_bucket(df: DataFrame, n_buckets: int, doc_id_col: str = "doc_id") -> DataFrame:
    """Deterministic salt bucket — the unit of partitioning AND lineage."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(doc_id_col)), F.lit(n_buckets)).cast("int")
    )


def repartition_for_extraction(
    df: DataFrame, parallelism: int, buckets_per_core: int = 4,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Salted repartition ahead of the extraction UDF (reference B6).

    Hash-partitions on the salt bucket with n_buckets = parallelism ×
    buckets_per_core: giant documents can't be split, so skew is tamed
    by giving the scheduler many small deterministic units to load-
    balance (long-tail amortization), not by oversizing partitions.
    """
    n_buckets = parallelism * buckets_per_core
    return with_salt_bucket(df, n_buckets, doc_id_col).repartition(n_buckets, "bucket")


def observed_extraction(extracted: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach extraction metrics (north_rule: docs parsed, spans
    emitted, malformed fallbacks) as a zero-cost Observation."""
    obs = Observation("extract_metrics")
    out = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("docs_parsed"),
        F.sum("n_spans").alias("spans_emitted"),
        F.sum(F.col("malformed").cast("long")).alias("malformed_fallbacks"),
    )
    return out, obs


def run_extraction_job(
    spark: SparkSession,
    documents: DataFrame,
    output_path: str,
    config: str = "boilerplate_strip",
    parallelism: int | None = None,
) -> dict:
    """End-to-end corpus parse (reference §3.2) with icelite commit +
    resume: read → salt/repartition → extract UDF → write committed
    snapshot with per-bucket lineage; already-committed buckets are
    skipped (reference B8's skip-if-done, done relationally)."""
    from .operators.extract import extract_documents
    from .plans.icelite import IceliteTable

    parallelism = parallelism or spark.sparkContext.defaultParallelism
    table = IceliteTable(output_path)

    salted = repartition_for_extraction(documents, parallelism)
    pending = table.filter_pending(salted)  # anti-join vs committed buckets
    extracted = extract_documents(pending, config).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(parallelism * 4)).cast("int")
    )
    observed, obs = observed_extraction(extracted)
    snapshot = table.commit_append(observed, partition_col="bucket")
    metrics = obs.get if snapshot is not None else {}
    return {"snapshot": snapshot, "metrics": metrics}
