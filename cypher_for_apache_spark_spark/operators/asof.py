"""As-of (point-in-time) joins over event streams.

Classic quant/feature-store primitive the reference engine has no analogue
for, but which every training-data pipeline with time-varying features
needs: for each left row, attach the most recent right row at-or-before
its timestamp (``backward``), or the earliest at-or-after (``forward``).

Scale design — the naive formulation is a range join
(``l.ts >= r.ts`` + greatest-per-key), which Spark executes as a
broadcast-nested-loop or an exploding theta-join; both die at 100 TB.
Instead we use the union + running-``last_value`` trick:

1. tag left rows 1 and right rows 0, union them by (key, ts, tag);
2. one window partitioned by key and ordered by (ts, tag) carries the
   latest right payload forward (``last(..., ignorenulls=True)``);
3. keep only left rows and unpack the carried payload.

Exactly ONE shuffle (the window's hash partitioning on the key), work is
O(|L| + |R|) per key with no intermediate blow-up, and skewed keys can be
pre-salted upstream with operators/skew.py. Ties at equal timestamps
order the right row first, so ``ts_left == ts_right`` matches — the same
inclusive semantics as DuckDB/pandas ``ASOF JOIN`` (the oracle).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the nearest right row per ``on`` key:
    the latest with ``right_ts <= left_ts`` (backward) or the earliest
    with ``right_ts >= left_ts`` (forward). Inclusive on equality.

    right_cols: right payload columns to carry (default: all but key/ts).
    tolerance_seconds: matches farther than this are nulled (and dropped
      under ``how='inner'``).
    how: 'left' keeps unmatched left rows with null payload; 'inner'
      drops them.

    Returns all left columns plus ``<right_ts><suffix>`` and each payload
    column as ``<name><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)

    ts_t = "timestamp"  # dtype-agnostic: NTZ / tz'd both cast cleanly
    payload = F.struct(
        F.col(right_ts).cast(ts_t).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    l_cols: List[Column] = [F.col(c) for c in left.columns]
    lhs = left.select(
        *l_cols,
        F.col(left_ts).cast(ts_t).alias("__t"),
        F.lit(1).alias("__tag"),
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        payload.alias("__p"),
        F.col(right_ts).cast(ts_t).alias("__t"),
        F.lit(0).alias("__tag"),
    )
    # missing columns (left payload on right rows, __p on left rows) are
    # typed-null-padded by unionByName
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    if direction == "backward":
        w = W.partitionBy(*on).orderBy(F.col("__t").asc(), F.col("__tag").asc())
    else:
        w = W.partitionBy(*on).orderBy(F.col("__t").desc(), F.col("__tag").asc())
    carried = F.last("__p", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    out = unioned.withColumn("__m", carried).filter(F.col("__tag") == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__m.__ts"))
        ) / F.lit(1e6)
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tolerance_seconds), F.col("__m"))
        )
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())

    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__m.__ts").alias(right_ts + suffix))
    sel.extend(F.col(f"__m.{c}").alias(c + suffix) for c in right_cols)
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Interval join: rows of ``left`` matched to every ``right`` row whose
    [start, end) interval contains ``left_point`` (optionally also equal on
    ``keys``). End-exclusive.

    Scale design — Spark's plan for the naive ``l.p >= r.s AND l.p < r.e``
    predicate is a broadcast-nested-loop (or an exploding theta join with
    keys); both are O(|L| x |R|) at 100 TB. Bucketing makes it an
    EQUI-join: each right interval explodes to the fixed-width buckets it
    covers, each left point lands in exactly one bucket, and the join key
    is (keys..., bucket) with the exact bound check as a post-filter. A
    (left, right) pair can meet in only one bucket — the one containing
    the point — so no dedup pass is needed. Cost is
    O(|L| + |R| x spans) where spans = interval_width / bucket; pick the
    bucket near the typical interval width to keep spans small. Point and
    interval columns are numeric (cast timestamps to epoch first).
    """
    lb = F.floor(F.col(left_point) / F.lit(bucket)).cast("long")
    span = F.sequence(
        F.floor(F.col(right_start) / F.lit(bucket)).cast("long"),
        # end-exclusive: an interval ending exactly on a bucket edge does
        # not cover that bucket
        F.floor(
            (F.col(right_end) - F.lit(bucket) / F.lit(1e9)) / F.lit(bucket)
        ).cast("long"),
    )
    l2 = left.withColumn("_rb", lb)
    r2 = right.withColumn("_rb", F.explode(span))
    joined = l2.join(r2, [*keys, "_rb"]).filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("_rb")
