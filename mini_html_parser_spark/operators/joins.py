"""Join-family custom operators Spark lacks natively.

As-of join (the time-series "latest right row at or before each left
row" join).  Spark has no ASOF JOIN; the naive theta-join
(``l.user = r.user AND r.ts <= l.ts`` + row_number) explodes to the
full per-key cross product before pruning.  The scale-correct shape is
union + window: tag both sides, sort once per key, and carry the last
non-null right value forward — ONE shuffle, linear work, no
per-key quadratic blowup.  (DuckDB has native ASOF JOIN, which is the
driver oracle for this operator.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains
    ``{prefix}{col}`` columns from the ``right`` row with the greatest
    ``ts_col`` ≤ the left row's (inclusive), per ``key_col``; null when
    no such row exists.

    Implementation: union the tagged sides, window-sort by
    ``(ts, side)`` with right rows first at equal timestamps
    (inclusiveness), and ``last(..., ignorenulls=True)`` each right
    value over the unbounded-preceding frame.  One shuffle on the key.
    Hot keys concentrate in one task (window skew is not AQE-fixable);
    for pathological keys pre-split by coarse time range and as-of
    join the boundary separately.
    """
    lcols = left.columns
    l_extra = [c for c in lcols if c not in (key_col, ts_col)]
    l = left.select(
        key_col, ts_col, *l_extra,
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in value_cols
        ],
    )
    r = right.select(
        F.col(key_col), F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_extra],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return u.filter(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in value_cols]
    )
