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

from pyspark.sql import Column, DataFrame, Observation, SparkSession, functions as F

DEFAULT_SHUFFLE_PARTITIONS = 32
ARROW_MAX_RECORDS = 256


def await_idle(
    threshold: float = 2.0,
    timeout_sec: float = 600.0,
    poll_sec: float = 10.0,
) -> dict:
    """Block until the 1-min load average falls below ``threshold``
    (bounded by ``timeout_sec``) and return a gate record for the
    benchmark artifact — the single implementation shared by bench.py
    and tools/scaling_bench.py so the two artifacts' gate records stay
    field-compatible.  ``status: "timeout_proceeded"`` means the box
    never got quiet: the numbers that follow are suspect by the
    artifact's own say-so."""
    import time

    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load >= threshold and time.monotonic() - t0 < timeout_sec:
        time.sleep(min(poll_sec, 1 + timeout_sec / 60))
        load = os.getloadavg()[0]
    return {
        "threshold": threshold,
        "waited_sec": round(time.monotonic() - t0, 1),
        "loadavg_at_timed_start": round(load, 2),
        "status": "idle" if load < threshold else "timeout_proceeded",
    }


def build_session(
    app_name: str = "mini-html-parser-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    iceberg_catalog: str | None = None,
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    """Session factory.

    ``iceberg_catalog``/``iceberg_warehouse`` wire a real Iceberg
    Hadoop catalog on clusters that ship the runtime jar
    (``--packages org.apache.iceberg:iceberg-spark-runtime-...``);
    offline, the icelite layer (plans/icelite.py) provides the same
    snapshot/resume semantics over plain parquet.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if iceberg_catalog:
        for k, v in iceberg_configs(iceberg_catalog, iceberg_warehouse).items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def iceberg_configs(catalog: str, warehouse: str | None = None) -> dict[str, str]:
    """The Spark confs that wire an Iceberg Hadoop catalog named
    ``catalog`` — usable from :func:`build_session`, from a job
    script's own builder, or spelled as ``--conf`` pairs on
    spark-submit (see jobs/submit_extract.sh).  The runtime jar comes
    from ``--packages org.apache.iceberg:iceberg-spark-runtime-<spark
    version>_<scala version>:<iceberg version>``; offline this sandbox
    has no jar, so the seam is config-only and icelite
    (plans/icelite.py) provides the snapshot/resume semantics over
    plain parquet."""
    return {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse or "warehouse",
    }


# documents above this many chars of span text are scheduled as
# near-singleton work units (a doc can't be split, so the critical
# path floor is the single biggest doc — giants must never stack)
GIANT_DOC_CHARS = 200_000
GIANT_BUCKET_SPACE = 1024


def with_salt_bucket(
    df: DataFrame, n_buckets: int, doc_id_col: str = "doc_id",
    spans_col: str | None = "spans", weight: Column | None = None,
) -> DataFrame:
    """Deterministic size-aware salt bucket — the unit of partitioning
    AND lineage (north_rule: skew handled explicitly).

    Normal docs hash into [0, n_buckets); giant docs hash into a much
    larger sparse space [n_buckets, n_buckets + GIANT_BUCKET_SPACE) so
    two giants almost never share a task (empty buckets cost nothing).
    Pure function of (doc_id, size) → resumable and replayable.
    """
    salt = F.pmod(F.xxhash64(F.col(doc_id_col)), F.lit(n_buckets))
    if weight is None and spans_col is not None and spans_col in df.columns:
        weight = F.aggregate(
            F.col(spans_col), F.lit(0), lambda acc, s: acc + F.length(s["text"])
        )
    if weight is not None:
        giant_salt = n_buckets + F.pmod(
            F.xxhash64(F.col(doc_id_col)), F.lit(GIANT_BUCKET_SPACE)
        )
        bucket = F.when(weight > GIANT_DOC_CHARS, giant_salt).otherwise(salt)
    else:
        bucket = salt
    return df.withColumn("bucket", bucket.cast("int"))


def repartition_for_extraction(
    df: DataFrame, parallelism: int, buckets_per_core: int = 2,
    doc_id_col: str = "doc_id", n_buckets: int | None = None,
    weight: Column | None = None,
) -> DataFrame:
    """Salted repartition ahead of the extraction UDF (reference B6).

    Two-tier skew policy:

    * normal docs hash into K = parallelism × buckets_per_core
      partitions on the deterministic salt (uniform weights → uniform
      partitions),
    * giant docs are split off and ROUND-ROBIN repartitioned across
      ``parallelism`` partitions — count-balanced, and giants are all
      the same order of magnitude, so no partition stacks several of
      them; the critical path approaches the single-biggest-document
      floor.

    The lineage ``bucket`` column stays the deterministic size-aware
    id from with_salt_bucket (resume prunes on the value, which is
    independent of physical placement).  Task counts stay at a few ×
    parallelism on purpose: a Python task costs O(100 ms) of fixed
    overhead, so thousands of near-empty partitions would dominate
    wall-clock (measured).
    """
    n_buckets = n_buckets or parallelism * buckets_per_core
    salted = with_salt_bucket(df, n_buckets, doc_id_col, weight=weight)
    # Physical placement: ROUND-ROBIN over 2×parallelism partitions —
    # measured fastest of four strategies on the skewed corpus at
    # local[32] (two-tier giant/small split union: 48s — the two
    # filter branches scan the source twice; byte-balanced scan
    # partitions, no shuffle: 35s; round-robin: 22s).  Round-robin
    # balances giant docs by count and the giant sizes are within one
    # order of magnitude, so expected per-partition work is even.
    # The lineage `bucket` column stays the deterministic size-aware
    # id — resume prunes on the VALUE, independent of placement.
    return salted.repartition(n_buckets)


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


def _resolve_layout(
    table, spark: SparkSession, output_path: str,
    parallelism: int | None, buckets_per_core: int,
) -> tuple[int, int, dict]:
    """Resume-stable bucket layout: reuse the manifest-recorded layout
    verbatim, error on conflicting explicit requests (see
    run_extraction_job docstring)."""
    recorded = table.partitioning()
    if recorded is not None:
        if (recorded.get("giant_bucket_space"), recorded.get("giant_doc_chars")) != (
            GIANT_BUCKET_SPACE, GIANT_DOC_CHARS
        ):
            raise ValueError(
                f"resume layout mismatch: table {output_path} was committed with "
                f"giant-doc tier {recorded}, but this build uses "
                f"{GIANT_BUCKET_SPACE}/{GIANT_DOC_CHARS}"
            )
        n_buckets = int(recorded["n_buckets"])
        if parallelism is not None and parallelism * buckets_per_core != n_buckets:
            raise ValueError(
                f"resume layout mismatch: table {output_path} was committed with "
                f"n_buckets={n_buckets}; requested parallelism={parallelism} × "
                f"buckets_per_core={buckets_per_core} = {parallelism * buckets_per_core}. "
                "Omit `parallelism` to reuse the recorded layout."
            )
        parallelism = parallelism or max(1, n_buckets // buckets_per_core)
    else:
        parallelism = parallelism or spark.sparkContext.defaultParallelism
        n_buckets = parallelism * buckets_per_core
    layout = {
        "n_buckets": n_buckets,
        "giant_bucket_space": GIANT_BUCKET_SPACE,
        "giant_doc_chars": GIANT_DOC_CHARS,
    }
    if recorded is not None and recorded.get("rebucketed"):
        # sticky: once the table has been re-laid-out, every future
        # manifest must keep advertising exact-resume (see
        # IceliteTable.requires_exact_resume)
        layout["rebucketed"] = True
    return parallelism, n_buckets, layout


def run_pdf_extraction_job(
    spark: SparkSession,
    pdfs: DataFrame,
    output_path: str,
    parallelism: int | None = None,
    buckets_per_core: int = 2,
    auto_compact_every: int | None = None,
    mode: str = "resume",
) -> dict:
    """PDF-corpus variant of :func:`run_extraction_job`: input is
    ``(doc_id, content binary)``, the extractor is
    :func:`~.operators.pdf.parse_pdf_interleaved`, and everything else
    — size-aware salting (giant tier keyed on the PDF byte length),
    committed-bucket resume, per-bucket lineage, observed metrics,
    auto-compaction — is the same machinery.  Output rows carry the
    interleaved span contract, so downstream consumers are shared with
    the HTML path."""
    from .operators.pdf import parse_pdf_interleaved

    return _run_job(
        spark, pdfs, output_path,
        lambda pending: parse_pdf_interleaved(
            pending, passthrough_cols=["bucket"]
        ).withColumn("n_spans", F.size("spans")),
        parallelism, buckets_per_core, auto_compact_every,
        weight=F.length("content"),
        mode=mode,
    )


def run_extraction_job(
    spark: SparkSession,
    documents: DataFrame,
    output_path: str,
    config: str = "boilerplate_strip",
    parallelism: int | None = None,
    buckets_per_core: int = 2,
    auto_compact_every: int | None = None,
    mode: str = "resume",
) -> dict:
    """End-to-end corpus parse (reference §3.2) with icelite commit +
    resume: read → salt/repartition → extract UDF → write committed
    snapshot with per-bucket lineage; already-committed buckets are
    skipped (reference B8's skip-if-done, done relationally).
    ``auto_compact_every=N`` folds the table to one snapshot whenever
    the active snapshot count reaches N (long incremental jobs) —
    committed buckets and the recorded layout survive compaction, so
    resume semantics are unchanged (pytest-pinned).

    Resume stability: the bucket id is a pure function of
    ``(doc_id, n_buckets)``, so the FIRST commit's layout is recorded
    in the manifest and reused verbatim on resume — a resume on a
    different cluster size keeps the committed bucket ids meaningful.
    An explicitly requested layout that conflicts with the recorded
    one raises instead of silently re-bucketing.
    """
    from .operators.extract import extract_documents

    return _run_job(
        spark, documents, output_path,
        lambda pending: extract_documents(
            pending, config, passthrough_cols=["bucket"]
        ),
        parallelism, buckets_per_core, auto_compact_every,
        mode=mode,
    )


def _run_job(
    spark: SparkSession,
    df: DataFrame,
    output_path: str,
    extract_stage,
    parallelism: int | None,
    buckets_per_core: int,
    auto_compact_every: int | None,
    weight: Column | None = None,
    mode: str = "resume",
) -> dict:
    """Shared job tail: layout resolve → salt → committed-bucket prune
    → extract_stage → observed metrics → icelite commit.  Both the
    HTML and PDF jobs are thin wrappers, so commit/resume/metrics
    semantics cannot drift between the two paths.

    ``mode``: ``"resume"`` (default) prunes already-committed buckets
    — re-running the SAME corpus is a no-op (skip-if-done).
    ``"append"`` commits everything — for ingesting a NEW corpus
    (e.g. the next day's crawl) into an existing table, where the new
    docs legitimately land in committed bucket ids and bucket-level
    pruning would silently drop them (exposed by the daily-ingest
    integration test).

    Append idempotence contract: the manifest IS the commit point, so
    a FAILED append leaves nothing behind and re-running is clean;
    re-running a SUCCEEDED append appends the batch a second time —
    crash-safety is per-run, and cross-run idempotence for appends
    belongs to the caller (check the returned snapshot, or
    ``dedup_against`` the increment downstream)."""
    if mode not in ("resume", "append"):
        raise ValueError(f"mode must be 'resume' or 'append', got {mode!r}")
    from .plans.icelite import IceliteTable

    table = IceliteTable(output_path)
    parallelism, n_buckets, layout = _resolve_layout(
        table, spark, output_path, parallelism, buckets_per_core
    )
    salted = repartition_for_extraction(
        df, parallelism, n_buckets=n_buckets, weight=weight
    )
    # prune committed buckets (resume) or take everything (append)
    pending = table.filter_pending(salted) if mode == "resume" else salted
    observed, obs = observed_extraction(extract_stage(pending))
    snapshot = table.commit_append(
        observed,
        partition_col="bucket",
        metrics_provider=lambda: {k: int(v) for k, v in obs.get.items()},
        partitioning=layout,
        auto_compact_every=auto_compact_every,
    )
    metrics = snapshot["metrics"] if snapshot is not None else {}
    return {"snapshot": snapshot, "metrics": metrics}


def warc_documents(
    spark: SparkSession, warc_path: str, warc_rows: DataFrame | None = None
) -> DataFrame:
    """WARC crawl segments → the engine's interleaved document
    contract ``(doc_id, spans)`` (doc_id = target URI, one html span
    per response record) — the adapter between
    :func:`sources.warc.read_warc` and :func:`run_extraction_job`,
    so a raw crawl runs through the same salted/resumable pipeline
    as any other corpus."""
    from .sources.warc import read_warc

    if warc_rows is None:
        warc_rows = read_warc(spark, warc_path)
    rows = warc_rows.filter(F.col("url").isNotNull())
    return rows.select(
        F.col("url").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.col("html").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def run_warc_extraction_job(
    spark: SparkSession,
    warc_path: str,
    output_path: str,
    config: str = "boilerplate_strip",
    parallelism: int | None = None,
    **kwargs,
) -> dict:
    """Crawl-in, spans-out: WARC segments through the full salted +
    icelite-resumable extraction job.  Same metrics/lineage contract
    as :func:`run_extraction_job`, PLUS ``warc_malformed_records`` —
    the source-level damage count (bad gzip members, truncated or
    garbage records) that would otherwise vanish in the adapter.
    The parsed rows are persisted across the damage-count action and
    the extraction job (then unpersisted — the job's commit action
    has completed by the time it returns), so the segments are
    decompressed and parsed ONCE and both numbers describe the same
    file listing."""
    from pyspark import StorageLevel

    from .sources.warc import read_warc

    warc_rows = read_warc(spark, warc_path).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        # per-file damage count rides on every row of its file (and on
        # a null-url marker row for files with zero parsed pages)
        warc_malformed = (
            warc_rows.groupBy("warc_file")
            .agg(F.max("file_malformed").alias("m"))
            .agg(F.sum("m").alias("s"))
            .first()["s"]
        ) or 0
        result = run_extraction_job(
            spark,
            warc_documents(spark, warc_path, warc_rows=warc_rows),
            output_path,
            config=config,
            parallelism=parallelism,
            **kwargs,
        )
    finally:
        warc_rows.unpersist()
    result["warc_malformed_records"] = int(warc_malformed)
    return result
