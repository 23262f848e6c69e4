"""As-of (nearest-event) join — the classic time-series operator Spark's
DataFrame API lacks (pandas merge_asof / DuckDB ASOF JOIN semantics).

For every left row, attach AT MOST ONE right row sharing the `by` keys:
the latest right row with right.on <= left.on (direction="backward",
inclusive) or the earliest with right.on >= left.on ("forward"). Left rows
with no qualifying right row keep nulls (left-join semantics). The
canonical uses: trade←quote attachment, purchase←click attribution,
sensor-reading←calibration lookup.

No reference implementation (training-data extension op). Implemented as a
composition of built-in operators — union + one window pass — NOT a
pairwise range join: tag each side, hash-partition by the `by` keys, sort
within partition by (event time, side tag), and carry the last non-null
right payload forward with last(ignorenulls=True). Exactly ONE shuffle of
|left|+|right| rows at any scale, no per-row Python, no O(|L|·|R|)
candidate blowup (the naive `l JOIN r ON key AND r.ts <= l.ts` +
row_number formulation explodes on dense keys; this never does). Skew
note: a hot `by` key serializes into one partition's sort — the same
bound as any windowed sessionization; salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    direction: str = "backward",
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
    rsuffix: str = "_r",
) -> DataFrame:
    """All left columns + right's non-`by` columns (suffixed with `rsuffix`
    on name clash), matched as-of. Nulls where no right row qualifies.

    tolerance_sec: max |left.on - right.on| in seconds; matches farther
    away come back as nulls (the left row survives). tiebreak: a right
    column that makes the choice deterministic when several right rows
    share (by, on) — the greatest wins for backward, least for forward;
    without it Spark's sort leaves equal-timestamp winners unspecified.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    rval_cols = [c for c in right.columns if c not in by]
    if on not in right.columns or on not in left.columns:
        raise ValueError(f"on column {on!r} must exist on both sides")

    l = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rval_cols]).alias("_rv"),
    )
    united = l.unionByName(r, allowMissingColumns=True)

    backward = direction == "backward"
    t_ord = F.col("_t").asc() if backward else F.col("_t").desc()
    order = [t_ord, F.col("_side").asc()]
    if tiebreak is not None:
        # right rows order by the tiebreak so the window's LAST equal-time
        # right row is the max (backward) / min (forward) — deterministic
        tb = F.col(f"_rv.{tiebreak}")
        order.insert(1, tb.asc_nulls_first() if backward else tb.desc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rv", ignorenulls=True).over(w)

    out = united.withColumn("_m", matched).filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        gap = F.col("_t").cast("double") - F.col(f"_m.{on}").cast("double")
        if not backward:
            gap = -gap
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_sec)), F.col("_m"))
        )

    lcols = set(left.columns)
    return out.select(
        F.col("_lrow.*"),
        *[
            F.col(f"_m.{c}").alias(c + rsuffix if c in lcols else c)
            for c in rval_cols
        ],
    )
