"""Corpus extraction job — the spark-submit entry point.

    spark-submit --py-files engine.zip jobs/extract_job.py \
        --input  <documents parquet/iceberg dir> \
        --output <icelite table dir> \
        --config boilerplate_strip \
        [--parallelism N] [--streaming]

Build engine.zip with ``python tools/package_pyfiles.py``.

Reads the interleaved documents table, salts/repartitions, runs the
extraction kernel, commits an icelite snapshot with per-bucket
lineage + metrics, and prints a one-line JSON job report.  Re-running
against the same output resumes: committed buckets are skipped.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--config", default="boilerplate_strip",
                   choices=["keep_everything", "boilerplate_strip",
                            "boilerplate_strip_br", "density_prune"])
    p.add_argument("--input-format", default="html",
                   choices=["html", "pdf", "warc"],
                   help="html: interleaved documents table through the "
                        "extraction kernel; pdf: (doc_id, content binary) "
                        "table through the PDF span parser; warc: a "
                        "directory of WARC crawl segments (ISO 28500, "
                        "plain or gzip)")
    p.add_argument("--parallelism", type=int, default=None)
    p.add_argument("--mode", default="resume", choices=["resume", "append"],
                   help="resume (default): re-running the SAME corpus "
                        "skips committed buckets; append: ingest a NEW "
                        "corpus (e.g. the next day's crawl) into an "
                        "existing table without bucket pruning")
    p.add_argument("--auto-compact-every", type=int, default=None,
                   help="fold the output table to one snapshot whenever "
                        "the active snapshot count reaches N")
    p.add_argument("--streaming", action="store_true",
                   help="treat --input as a stream source; by default an "
                        "availableNow catch-up batch that terminates when "
                        "current files are processed (checkpointed — "
                        "re-running picks up only new files)")
    p.add_argument("--continuous", action="store_true",
                   help="with --streaming: keep running and process files "
                        "as they arrive instead of the availableNow batch")
    p.add_argument("--streaming-sink", default="parquet",
                   choices=["parquet", "icelite"],
                   help="with --streaming: parquet (default) appends to a "
                        "flat directory; icelite commits each micro-batch "
                        "as a bucket-salted snapshot of the SAME table "
                        "layout the batch job writes — time travel, "
                        "incremental scans, and replay-idempotent commits "
                        "over the stream's ingest history")
    p.add_argument("--iceberg-catalog", default=None,
                   help="Iceberg catalog name to wire into the session "
                        "(needs the runtime jar via --packages; see "
                        "jobs/submit_extract.sh).  When set, --input may "
                        "be a table identifier like <catalog>.db.documents")
    p.add_argument("--iceberg-warehouse", default=None)
    args = p.parse_args(argv)
    if args.streaming and args.input_format != "html":
        p.error("--streaming currently supports --input-format html only")
    if args.streaming and args.mode != "resume":
        p.error("--mode applies to batch jobs only (the streaming sink's "
                "checkpoint provides its own exactly-once semantics)")
    if args.continuous and not args.streaming:
        p.error("--continuous requires --streaming")

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("mini-html-parser-extract")
    if args.iceberg_catalog:
        from mini_html_parser_spark.pipeline import iceberg_configs

        for k, v in iceberg_configs(
            args.iceberg_catalog, args.iceberg_warehouse
        ).items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()

    if args.streaming:
        from mini_html_parser_spark.streaming.extract_stream import (
            extract_stream, read_document_stream, start_extraction_sink,
            start_icelite_sink,
        )

        stream = extract_stream(
            read_document_stream(spark, args.input), args.config
        )
        if args.streaming_sink == "icelite":
            q = start_icelite_sink(
                stream,
                table_path=args.output,
                checkpoint_dir=args.output + "/_checkpoint",
                available_now=not args.continuous,
            )
        else:
            q = start_extraction_sink(
                stream,
                output_dir=args.output + "/data/stream",
                checkpoint_dir=args.output + "/_checkpoint",
                available_now=not args.continuous,
            )
        q.awaitTermination()
        print(json.dumps({
            "mode": "streaming",
            "sink": args.streaming_sink,
            "trigger": "continuous" if args.continuous else "availableNow",
            "output": args.output,
        }))
        return 0

    from mini_html_parser_spark.pipeline import (
        run_extraction_job,
        run_pdf_extraction_job,
        run_warc_extraction_job,
    )

    if args.input_format == "warc":
        result = run_warc_extraction_job(
            spark, args.input, args.output, config=args.config,
            parallelism=args.parallelism,
            auto_compact_every=args.auto_compact_every,
            mode=args.mode,
        )
        snap = result["snapshot"]
        print(json.dumps({
            "mode": "batch-warc",
            "snapshot_id": snap["snapshot_id"] if snap else None,
            "committed_rows": snap["total_rows"] if snap else 0,
            "metrics": {k: int(v) for k, v in (result["metrics"] or {}).items()},
            "warc_malformed_records": result.get("warc_malformed_records", 0),
            "output": args.output,
        }))
        return 0

    if args.iceberg_catalog and args.input.startswith(args.iceberg_catalog + "."):
        documents = spark.table(args.input)  # catalog table swap-in
    else:
        documents = spark.read.parquet(args.input)
    if args.input_format == "pdf":
        result = run_pdf_extraction_job(
            spark, documents, args.output,
            parallelism=args.parallelism,
            auto_compact_every=args.auto_compact_every,
            mode=args.mode,
        )
    else:
        result = run_extraction_job(
            spark, documents, args.output, config=args.config,
            parallelism=args.parallelism,
            auto_compact_every=args.auto_compact_every,
            mode=args.mode,
        )
    snap = result["snapshot"]
    print(json.dumps({
        "mode": "batch",
        "snapshot_id": snap["snapshot_id"] if snap else None,
        "committed_rows": snap["total_rows"] if snap else 0,
        "metrics": {k: int(v) for k, v in (result["metrics"] or {}).items()},
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
