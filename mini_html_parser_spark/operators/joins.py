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
    tolerance: "Column | None" = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains
    ``{prefix}{col}`` columns from the ``right`` row with the greatest
    ``ts_col`` ≤ the left row's (inclusive), per ``key_col``; null when
    no such row exists.

    ``tolerance`` (optional): a Column/literal in the ts column's
    difference units — matches older than ``left.ts - tolerance`` are
    nulled out (pandas ``merge_asof(tolerance=…)`` semantics).  The
    matched right timestamp is always emitted as ``{prefix}{ts_col}``.

    Implementation: union the tagged sides, window-sort by
    ``(ts, side)`` with right rows first at equal timestamps
    (inclusiveness), and ``last(..., ignorenulls=True)`` each right
    value over the unbounded-preceding frame.  One shuffle on the key.
    Hot keys concentrate in one task (window skew is not AQE-fixable);
    for pathological keys pre-split by coarse time range and as-of
    join the boundary separately.
    """
    if ts_col in value_cols:
        raise ValueError("ts_col is always emitted as the asof timestamp; "
                         "don't list it in value_cols")
    lcols = left.columns
    l_extra = [c for c in lcols if c not in (key_col, ts_col)]
    carried = list(value_cols) + ["__ts"]
    l = left.select(
        key_col, ts_col, *l_extra,
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in value_cols
        ],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r___ts"),
    )
    r = right.select(
        F.col(key_col), F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_extra],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts_col).alias("_r___ts"),
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
            for c in carried
        ],
    )
    out = u.filter(F.col("_side") == 1).drop(
        "_side", *[f"_r_{c}" for c in carried]
    )
    matched_ts = F.col(f"{prefix}__ts")
    if tolerance is not None:
        in_window = (
            F.col(ts_col).cast("double") - matched_ts.cast("double")
        ) <= tolerance
        out = out.select(
            *[c for c in out.columns if not c.startswith(prefix)],
            *[
                F.when(in_window, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
                for c in carried
            ],
        )
    return out.withColumnRenamed(f"{prefix}__ts", f"{prefix}{ts_col}")
