"""Join-family custom operators Spark lacks natively.

As-of join (the time-series "latest right row at or before each left
row" join).  Spark has no ASOF JOIN; the naive theta-join
(``l.user = r.user AND r.ts <= l.ts`` + row_number) explodes to the
full per-key cross product before pruning.  The scale-correct shape is
union + window: tag both sides, sort once per key, and carry the last
non-null right value forward — ONE shuffle, linear work, no
per-key quadratic blowup.  (DuckDB has native ASOF JOIN, which is the
driver oracle for this operator.)

Hot keys: a window partitioned by key serializes each key into one
task — not AQE-fixable — so one pathological key (a bot user with 10⁹
events) becomes a straggler.  ``split_hot_keys=N`` re-partitions the
window by (key, coarse-time-range): each side is bucketed into N
global time ranges, the window runs within (key, range), and a small
per-(key, range) summary table injects the carry-in right row each
range needs from earlier ranges — same results, parallelism N per key.
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
    split_hot_keys: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains
    ``{prefix}{col}`` columns from the ``right`` row with the greatest
    ``ts_col`` ≤ the left row's (inclusive), per ``key_col``; null when
    no such row exists.

    ``tolerance`` (optional): a Column/literal in the ts column's
    difference units — matches older than ``left.ts - tolerance`` are
    nulled out (pandas ``merge_asof(tolerance=…)`` semantics).  The
    matched right timestamp is always emitted as ``{prefix}{ts_col}``.

    ``split_hot_keys=N`` (optional, N > 1): split every key's window
    into N coarse global time ranges so no key serializes into a
    single task (see module docstring).  Costs one tiny min/max job at
    plan-build time plus two metadata-scale shuffles (the distinct
    (key, range) universe and its per-range right summaries); the big
    window shuffle then partitions by (key, range).  Results are
    identical to the unsplit plan (pinned by pytest parity).

    Implementation: union the tagged sides, window-sort by
    ``(ts, side)`` with right rows first at equal timestamps
    (inclusiveness), and ``last(..., ignorenulls=True)`` over ONE
    struct holding the whole right row — so the emitted values are the
    matched row's fields verbatim, nulls included (DuckDB/pandas ASOF
    matched-row semantics; a per-column fill-forward would leak an
    older row's value through a matched row's null).  One shuffle on
    the key (or on (key, range) when splitting).
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

    # deterministic tie-break among right rows sharing (key, ts): the
    # greatest value tuple wins (same rule as the split path's
    # max(struct(ts, values)) summaries — and it makes the operator
    # deterministic instead of picking an arbitrary tied row)
    order_cols = [ts_col, "_side", *[f"_r_{c}" for c in carried]]

    drop_extra: list[str] = []
    if split_hot_keys and split_hot_keys > 1:
        u, w = _split_union(
            l, r, left, right, key_col, ts_col, l_extra, carried,
            order_cols, int(split_hot_keys),
        )
        drop_extra = ["_rg"]
    else:
        u = l.unionByName(r)
        w = (
            Window.partitionBy(key_col)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    # carry the matched right row as ONE struct: emitted values are
    # the matched row's fields verbatim (nulls included) — identical
    # to DuckDB/pandas ASOF matched-row semantics.  Per-column
    # last(_r_c, ignorenulls=True) would instead fill each column
    # forward independently (an older row's value shows through a
    # matched row's null), and the split path's single-row carry-in
    # could not reproduce that.
    matched_row = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"_r_{c}").alias(c) for c in carried]),
    )
    u = u.select(
        "*", F.last(matched_row, ignorenulls=True).over(w).alias("_m")
    )
    u = u.select(
        "*", *[F.col("_m").getField(c).alias(f"{prefix}{c}") for c in carried]
    )
    out = u.filter(F.col("_side") == 1).drop(
        "_side", "_m", *drop_extra, *[f"_r_{c}" for c in carried]
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


def _split_union(
    l: DataFrame,
    r: DataFrame,
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    l_extra: list[str],
    carried: list[str],
    order_cols: list[str],
    n_splits: int,
):
    """Tagged union + window spec for the hot-key-split plan.

    Ranges are N equal slices of the GLOBAL [min, max] ts (one cheap
    map-combined agg at build time — both sides project to a single
    double column).  Each (key, range) needs the latest right row from
    earlier ranges as carry-in; that's a per-(key, range) summary
    (``max(struct(ts, values))`` — one metadata-scale aggregation) run
    through a running ``last`` over the distinct (key, range) universe
    of BOTH sides (left-only ranges still need carry-in), then injected
    as synthetic right rows.  The synthetic row keeps its REAL
    timestamp (it sorts first in its range because it's older than the
    range start, and the emitted matched-ts / tolerance math stays
    exact).
    """
    ts_d = F.col(ts_col).cast("double")
    bounds = (
        left.select(ts_d.alias("_t"))
        .unionAll(right.select(ts_d.alias("_t")))
        .agg(F.min("_t").alias("lo"), F.max("_t").alias("hi"))
        .first()
    )
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None or hi is None or hi <= lo:
        # empty input or a single instant: nothing to split
        u = l.unionByName(r).withColumn("_rg", F.lit(0))
        w = (
            Window.partitionBy(key_col, "_rg")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return u, w
    width = (hi - lo) / n_splits
    rg = F.least(
        F.greatest(F.floor((ts_d - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_splits - 1),
    ).cast("int")

    l2 = l.withColumn("_rg", rg)
    r2 = r.withColumn("_rg", rg)

    universe = (
        l2.select(key_col, "_rg").unionByName(r2.select(key_col, "_rg")).distinct()
    )
    rsum = r2.groupBy(key_col, "_rg").agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("_t"),
                *[F.col(f"_r_{c}").alias(f"_r_{c}") for c in carried],
            )
        ).alias("_s")
    )
    carry_w = (
        Window.partitionBy(key_col)
        .orderBy("_rg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        universe.join(rsum, [key_col, "_rg"], "left")
        .select(
            key_col, "_rg",
            F.last("_s", ignorenulls=True).over(carry_w).alias("_c"),
        )
        .filter(F.col("_c").isNotNull())
    )
    synth = carry.select(
        F.col(key_col),
        F.col("_c._t").alias(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_extra],
        F.lit(0).alias("_side"),
        *[F.col(f"_c._r_{c}").alias(f"_r_{c}") for c in carried],
        F.col("_rg"),
    )
    u = l2.unionByName(r2).unionByName(synth.select(*l2.columns))
    w = (
        Window.partitionBy(key_col, "_rg")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return u, w


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Interval (range) join: every ``left`` row paired with each
    ``right`` row whose ``[start_col, end_col)`` interval contains the
    left row's ``point_col`` (and whose ``key_cols`` match, when
    given).  Spark plans the naive theta-join
    (``start <= p AND p < end``) as a BroadcastNestedLoopJoin — an
    O(|L|·|R|) scan per partition that no AQE setting rescues once
    both sides are large.

    The scale-correct shape is BIN BUCKETING (the range-join
    optimization Databricks exposes as a hint, built from primitives
    here): each interval explodes into the ``bin_width``-sized bins it
    covers (one ``F.sequence`` — pure codegen), each point lands in
    exactly ONE bin, and the join becomes a plain shuffled EQUI-join
    on (key?, bin) + a residual containment filter.  Each matching
    pair meets in exactly one bin (the point's), so no dedup pass is
    needed.  Cost: |R| × (interval_len / bin_width) exploded rows —
    pick ``bin_width`` near the MEDIAN interval length so typical
    intervals land in 1-2 bins; short bins inflate the right side,
    long bins inflate the residual filter's false candidates, and both
    degrade gracefully rather than quadratically.

    Columns are numeric (cast timestamps to epoch seconds/micros
    upstream — keeps the binning arithmetic engine-portable).  Output:
    the left row plus the matched right row's non-key columns.
    """
    key_cols = key_cols or []
    p, s, e = F.col(point_col), F.col(start_col), F.col(end_col)
    # Degenerate intervals (end <= start) can never contain a point
    # under start <= p < end, so dropping them is semantics-preserving
    # — and MANDATORY before the sequence: Spark's two-arg F.sequence
    # defaults to step -1 when start > stop, so one corrupted/sentinel
    # reversed interval (e.g. end=0) would materialize a multi-million
    # element DESCENDING bin array on an executor (review r6 pass 2).
    right = right.filter(e > s)
    # Bin ids via EXACT integer arithmetic (ADVICE r6): the previous
    # F.floor(col / bin_width) went through double division, which can
    # assign point and interval to DIFFERENT bins once |value| nears
    # 2^53 (epoch nanoseconds) — silently DROPPING matching pairs,
    # because the residual filter only removes false positives.
    # floor_div(x, w) = (x - pmod(x, w)) div w is exact over the full
    # int64 range (pmod is non-negative, so the numerator is a
    # multiple of w and `div` truncation equals floor).  Domain
    # contract: binning columns are integral-valued (cast timestamps
    # to epoch seconds/micros/nanos upstream — already the documented
    # contract; the exclusive-end `e - 1` arithmetic assumes it too).
    w = int(bin_width)

    def _floor_bin(expr_sql: str) -> F.Column:
        x = f"CAST(({expr_sql}) AS BIGINT)"
        return F.expr(f"({x} - pmod({x}, {w})) div {w}")

    # last covered bin: (end - 1) // w — end is exclusive, so an
    # interval ending exactly on a bin edge must NOT claim that bin
    bins = F.sequence(
        _floor_bin(f"`{start_col}`"), _floor_bin(f"`{end_col}` - 1")
    )
    r_binned = right.withColumn("_bin", F.explode(bins))
    l_binned = left.withColumn("_bin", _floor_bin(f"`{point_col}`"))
    on = ["_bin", *key_cols]
    out_cols = [
        *[F.col(c) for c in left.columns],
        *[F.col(c) for c in right.columns if c not in key_cols],
    ]
    return (
        l_binned.join(r_binned, on)
        .filter((s <= p) & (p < e))
        .select(*out_cols)
    )
