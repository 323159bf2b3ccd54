"""Statistics module — the reference's two-phase stats job as ONE
Catalyst plan (reference: statistics/compute_aggregate_stats.py +
create_stats.py; SURVEY.md §3.3, operators B11–B23).

Phase 1 (per-doc × tag) and phase 2 (corpus describe per tag) were a
CSV hop + dask job in the reference; here they are two chained
``groupBy`` levels over the exploded span table — partial/final hash
aggregation, no materialization between phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .extract import explode_spans

# numeric stat columns of the per-doc table (FIXTURES.md §3; column
# order pinned by statistics/create_stats.py:35-51)
_STAT_COLS = [
    "count_per_doc",
    "text_length_mean", "text_length_median", "text_length_std",
    "text_length_max", "text_length_min",
    "self_closing",
    "token_length_mean", "token_length_median", "token_length_std",
    "token_length_max", "token_length_min",
]


def span_rows(extracted: DataFrame, tokenizer: str = "bytes") -> DataFrame:
    """Exploded spans + derived columns (reference B11–B16).

    ``text_length = char_end_idx - char_start_idx`` with null end
    backfilled from start (B13, compute_aggregate_stats.py:52-54);
    ``self_closing = (end == start)``; span text sliced from the doc
    text (B15) and token length from the pluggable tokenizer (B16 —
    GPT-2 offline-unavailable; default proxy = byte length, alt =
    whitespace token count).
    """
    df = explode_spans(extracted)
    df = df.withColumn(
        "char_end_idx", F.coalesce("char_end_idx", "char_start_idx")
    ).withColumn(
        "text_length", (F.col("char_end_idx") - F.col("char_start_idx")).cast("double")
    ).withColumn(
        "self_closing", (F.col("char_end_idx") == F.col("char_start_idx")).cast("int")
    ).withColumn(
        "span_text",
        F.expr("substring(text, char_start_idx + 1, char_end_idx - char_start_idx)"),
    )
    if tokenizer == "bytes":
        df = df.withColumn("token_length", F.octet_length("span_text").cast("double"))
    elif tokenizer == "whitespace":
        df = df.withColumn(
            "token_length",
            F.size(F.split(F.trim(F.col("span_text")), r"\s+")).cast("double"),
        )
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return df.drop("text")


def span_stats(extracted: DataFrame, tokenizer: str = "bytes") -> DataFrame:
    """Per-(doc, tag) statistics (reference phase 1, B18/B19;
    compute_aggregate_stats.py:72-90).  Exact median to match pandas."""
    rows = span_rows(extracted, tokenizer)
    agg = rows.groupBy("doc_id", "tag").agg(
        F.count("*").alias("count_per_doc"),
        F.avg("text_length").alias("text_length_mean"),
        F.median("text_length").alias("text_length_median"),
        F.stddev("text_length").alias("text_length_std"),
        F.max("text_length").alias("text_length_max"),
        F.min("text_length").alias("text_length_min"),
        F.sum("self_closing").alias("self_closing_sum"),
        F.avg("token_length").alias("token_length_mean"),
        F.median("token_length").alias("token_length_median"),
        F.stddev("token_length").alias("token_length_std"),
        F.max("token_length").alias("token_length_max"),
        F.min("token_length").alias("token_length_min"),
    )
    # self_closing ratio (B19, compute_aggregate_stats.py:88-90)
    return agg.withColumn(
        "self_closing", (F.col("self_closing_sum") / F.col("count_per_doc")).cast("double")
    ).drop("self_closing_sum")


def tag_stats(per_doc: DataFrame) -> DataFrame:
    """Corpus-level describe() per tag (reference phase 2, B20;
    compute_aggregate_stats.py:134-136): count/mean/std/min/p25/p50/
    p75/max for every numeric column, one output row per (tag, stat
    column) — a long-format describe that one groupBy computes."""
    stacked = per_doc.select(
        "tag",
        F.expr(
            "stack({n}, {pairs}) as (stat_col, value)".format(
                n=len(_STAT_COLS),
                pairs=", ".join(f"'{c}', cast({c} as double)" for c in _STAT_COLS),
            )
        ),
    )
    return (
        stacked.groupBy("tag", "stat_col")
        .agg(
            F.count("value").alias("count"),
            F.avg("value").alias("mean"),
            F.stddev("value").alias("std"),
            F.min("value").alias("min"),
            F.percentile("value", F.lit(0.25)).alias("p25"),
            F.percentile("value", F.lit(0.50)).alias("p50"),
            F.percentile("value", F.lit(0.75)).alias("p75"),
            F.max("value").alias("max"),
        )
    )
