"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over sf0.001;
``queries()``/``oracle_sql()`` — operator surface from SURVEY.md §2
with DuckDB oracles (CORRECTNESS gate).  Implementations live in
``mini_html_parser_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full interleaved-document extraction (HTML synthesized
    from the sf0.001 documents table, media span anchored in order) →
    exploded span rows."""
    from mini_html_parser_spark.queries import q_extract_interleaved_media

    return q_extract_interleaved_media(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mini_html_parser_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mini_html_parser_spark.queries import ORACLES

    return dict(ORACLES)
