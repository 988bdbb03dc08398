"""Event-table operators: sessionization, top-k per group, windowed rollups.

Beyond Cypher's surface (window functions are absent from it) but core to a
training-data pipeline; each is a single window/aggregation whose oracle is
plain ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_minutes``. One window shuffle,
    partitioned by user — scales with user cardinality, not total rows."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-precision gap (unix_timestamp truncates to seconds);
    # cast makes this dtype-agnostic — unix_micros rejects TIMESTAMP_NTZ,
    # which is what parquet TIMESTAMP(NANOS) reads as on Spark 4+
    gap = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(prev_ts.cast("timestamp"))
    ) / F.lit(1e6)
    new_sess = F.when(prev_ts.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn(
        "session_seq", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    )


def topk_per_group(
    df: DataFrame,
    part_cols,
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_col: str = None,
) -> DataFrame:
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = W.partitionBy(*part_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "rank")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
    group_cols=("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Event-time bucket rollup (the batch analogue of the streaming
    windowed aggregation in streaming/)."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    return (
        df.groupBy(b, *group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col)).alias("sum_value"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are assigned to the period of their
    FIRST activity; each cell counts distinct users of that cohort active
    in a later period.

    Two aggregations and one equi-join, all keyed on the user id / small
    (cohort, period) pairs — the cohort map is |users| wide and the
    activity frame collapses to distinct (user, period) before the join,
    so no shuffle ever carries more than one row per user-period."""
    ts = F.col(ts_col).cast("timestamp")
    cohorts = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts)).alias("cohort")
    )
    activity = df.select(
        F.col(user_col), F.date_trunc(period, ts).alias("period")
    ).dropDuplicates()
    return (
        activity.join(cohorts, user_col)
        .groupBy("cohort", "period")
        .agg(F.count("*").alias("active_users"))
    )
