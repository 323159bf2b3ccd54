"""Sampling operators (reference B9/B10).

The reference's dataset reducer enumerates every (file, line) and
draws ``random.sample(indexes, n)`` (parse_scripts/dataset_reducer.py:
15-39).  Distributed equivalents:

* exact-n without replacement, deterministic: order by a seeded hash
  of the id and take n — a TakeOrderedAndProject, no full sort
  materialization;
* approximate fraction: ``df.sample`` (per-partition Bernoulli, no
  shuffle at all) for when exactness doesn't matter at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sample_exact_n(df: DataFrame, n: int, seed: int = 42, id_col: str = "doc_id") -> DataFrame:
    """Deterministic exact-n sample without replacement."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    return df.orderBy(key.asc(), F.col(id_col).asc()).limit(n)


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def enumerate_rows(df: DataFrame, partition_col: str, order_col: str) -> DataFrame:
    """Row numbering within a partition key (reference B10's
    ``doc_id = f"{file}_{compt}"`` line index)."""
    from pyspark.sql import Window

    w = Window.partitionBy(partition_col).orderBy(order_col)
    return df.withColumn("row_idx", F.row_number().over(w) - 1)


def sample_exact_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: exactly min(n, group size)
    rows per ``group_col`` value.  The order key is the md5 hex of
    ``"{id}#{seed}"`` — a string compare identical in every engine, so
    a DuckDB oracle reproduces the selection bit-for-bit.  One window
    shuffle on the group; no global sort (each partition sorts
    locally)."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
