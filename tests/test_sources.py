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
