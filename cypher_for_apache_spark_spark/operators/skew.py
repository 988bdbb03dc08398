"""Skew handling for joins on hot keys.

At 100 TB a handful of heavy-hitter keys (null-ish defaults, bot users,
empty documents) can pin one reducer for hours. Spark's AQE skew-join
(``spark.sql.adaptive.skewJoin.enabled``, on by default here) already
splits oversized SHUFFLE partitions at runtime and is the first line of
defense — these helpers cover the cases AQE cannot:

- ``hot_keys``: cheap heavy-hitter diagnostic (one map-side-combinable
  aggregation) for deciding whether salting is warranted and with what
  factor;
- ``salted_join``: explicit salting for an equi-join where ONE side's key
  distribution is pathological. The skewed side gets a deterministic salt
  ``pmod(xxhash64(key, row-entropy), factor)``; the other side is
  replicated ``factor`` times JVM-side (explode of a literal range — no
  data is shipped from the driver). The join key becomes (key, salt), so
  a hot key's rows spread over ``factor`` reducers. Result equals the
  plain join exactly (verified in tests); use when AQE's split cannot
  help — e.g. the skew is in a single key whose matching build rows also
  blow past a task, or the join feeds a window partitioned the same way.

Salting multiplies the replicated side by ``factor`` — keep it small
(8-64) and only replicate the SMALLER side.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def hot_keys(df: DataFrame, keys: Sequence[str], min_count: int = 100_000) -> DataFrame:
    """(keys..., n) for key combinations exceeding ``min_count`` rows,
    heaviest first — the salting decision input."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc())
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``on``, spreading each of the
    skewed side's keys over ``factor`` reducers.

    ``how`` supports inner and left (the skewed side is the left/probe
    side); the salt columns never appear in the result."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    # deterministic per-row salt: row entropy from every column keeps the
    # salt uniform even when non-key columns repeat
    entropy = [c for c in skewed.columns if c not in on] or on
    left = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in on + entropy]), F.lit(factor)).cast("int")
    )
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    out = left.join(right, on + [_SALT], how)
    return out.drop(_SALT)


def degree_skew_factor(
    df: DataFrame,
    key: str,
    sample_rows: int = 100_000,
    hot_share: float = 0.05,
    min_hub: int = 64,
    factor: int = 16,
) -> int:
    """Cheap supernode sniff for auto-salting an expand join: bound the
    work to ``sample_rows`` rows of the key column, count per-key, and
    return ``factor`` when one key holds ``hot_share`` of the sample AND
    at least ``min_hub`` rows (tiny tables never trigger — salting them
    is pointless), else 0. One narrow job over a limited scan regardless
    of table size; callers memoize per (graph, rel types, direction)."""
    agg = (
        df.select(key)
        .limit(sample_rows)
        .groupBy(key)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("total"))
        .first()
    )
    if agg is None or agg["total"] is None:
        return 0
    mx, total = int(agg["mx"]), int(agg["total"])
    return factor if mx >= min_hub and mx >= hot_share * total else 0
