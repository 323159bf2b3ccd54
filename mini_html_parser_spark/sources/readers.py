"""Sources & sinks (reference B1–B5).

The reference streams gzipped JSONL by hand and writes gzip CSV
(parse_natural_questions.py:37-53; compute_aggregate_stats.py:40-104).
Here every format is a declarative reader/writer so Catalyst gets
projection/predicate pushdown; cloud paths (``gs://``/``s3a://``)
pass straight through to the Hadoop FS connectors (B2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_tables(spark: SparkSession, sf_dir: str, names=None) -> dict:
    out = {}
    for name in names or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL / JSONL.GZ source (reference B1) — gzip decoded by the
    Hadoop codec automatically."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl_gz(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Gzip JSONL sink (reference B3)."""
    df.write.mode(mode).option("compression", "gzip").json(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = False) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_csv_gz(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """Gzip CSV sink (reference B5)."""
    df.write.mode(mode).option("header", str(header).lower()).option(
        "compression", "gzip"
    ).csv(path)
