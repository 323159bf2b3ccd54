"""Source/sink round-trips (reference B1/B3/B5)."""

import glob
import gzip
import os

from pyspark.sql import functions as F

from mini_html_parser_spark.sources import readers


def test_jsonl_gz_roundtrip(spark, tmp_path):
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body-"), F.col("id")).alias("document_html"),
    )
    path = str(tmp_path / "out_jsonl")
    readers.write_jsonl_gz(df, path)
    files = glob.glob(os.path.join(path, "*.json.gz"))
    assert files, "expected gzip json part files"
    with gzip.open(files[0], "rt") as f:
        assert '"document_html"' in f.readline()
    back = readers.read_jsonl(spark, path)
    assert back.count() == 50
    assert set(back.columns) == {"doc_id", "document_html"}


def test_csv_gz_roundtrip(spark, tmp_path):
    df = spark.range(0, 20).select(
        F.col("id").alias("tag_id"), F.lit(1.5).alias("score")
    )
    path = str(tmp_path / "out_csv")
    readers.write_csv_gz(df, path)
    assert glob.glob(os.path.join(path, "*.csv.gz"))
    back = readers.read_csv(spark, path, schema="tag_id long, score double", header=True)
    assert back.count() == 20
    assert back.agg(F.sum("score")).collect()[0][0] == 30.0


def test_register_tables(spark):
    tables = readers.register_tables(spark, "/root/testdata/sf0.001")
    assert "documents" in tables and "lineitem" in tables
    assert spark.sql("select count(*) n from documents").collect()[0]["n"] == 500


def test_extract_job_cli(spark, tmp_path):
    """jobs/extract_job.py end-to-end through its argparse surface
    (batch mode, local parquet), plus the Iceberg deploy seam: the
    config dict jobs/submit_extract.sh spells as --conf pairs must
    come from iceberg_configs() verbatim (no jar offline, so the seam
    is exercised up to session-config assembly)."""
    import sys

    sys.path.insert(0, "jobs")
    import extract_job

    from mini_html_parser_spark.datagen import generate_documents
    from mini_html_parser_spark.pipeline import iceberg_configs

    src = str(tmp_path / "docs")
    out = str(tmp_path / "table")
    generate_documents(spark, 12, partitions=2).write.parquet(src)
    rc = extract_job.main([
        "--input", src, "--output", out, "--config", "boilerplate_strip",
        "--parallelism", "2",
    ])
    assert rc == 0
    from mini_html_parser_spark.plans.icelite import IceliteTable

    assert IceliteTable(out).read(spark).count() == 12

    cfg = iceberg_configs("lake", "s3a://bkt/wh")
    assert cfg["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert cfg["spark.sql.catalog.lake.warehouse"] == "s3a://bkt/wh"
    assert cfg["spark.sql.catalog.lake.type"] == "hadoop"
    assert "IcebergSparkSessionExtensions" in cfg["spark.sql.extensions"]
