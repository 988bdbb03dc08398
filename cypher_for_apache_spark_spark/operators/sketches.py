"""Mergeable sketches for approximate analytics at 100 TB.

The scale pattern these enable: sketch ONCE at the finest grain (e.g.
per day x source), persist the sketch column, then answer ANY coarser
rollup (per month, per source, global) by merging sketches — no second
pass over raw data, and merges are associative so they parallelize
arbitrarily. Exact distinct counts can't do this (distinct sets don't
merge without the raw values); HLL sketches are a few KB each.

Built on Spark's native DataSketches HLL expressions (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate — JVM-side, codegen-friendly, no
UDFs). ``lgConfigK=14`` (~16 KB per sketch, ~0.8% relative error) is the
default; raise it for tighter error.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lg_k: int = 14,
    out_col: str = "hll",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` (binary column, mergeable)."""
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(out_col)
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


def hll_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "hll",
) -> DataFrame:
    """Merge fine-grained sketches up to ``group_cols`` (associative —
    this is the arbitrarily-parallel rollup step)."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    return (
        sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    )


def hll_estimate(df: DataFrame, sketch_col: str = "hll", out_col: str = "distinct_est") -> DataFrame:
    """Materialize the cardinality estimate from a sketch column."""
    return df.withColumn(out_col, F.hll_sketch_estimate(F.col(sketch_col))).drop(
        sketch_col
    )


def distinct_rollup(
    df: DataFrame,
    value_col: str,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    lg_k: int = 14,
) -> DataFrame:
    """End-to-end demo of the pattern: sketch at ``fine_cols`` grain, then
    merge to ``coarse_cols`` and estimate. Identical estimates to
    sketching directly at the coarse grain (same sketch algebra), at a
    fraction of the cost when the fine sketches are reused across many
    rollups."""
    fine = hll_sketch(df, value_col, fine_cols, lg_k=lg_k)
    return hll_estimate(hll_merge(fine, coarse_cols))


# --------------------------------------------------------------------------
# Portable HLL (cross-engine bit-exact register state)
# --------------------------------------------------------------------------
#
# Spark's DataSketches HLL binaries aren't reproducible in other engines,
# so the rollup above is rows-only under the driver's oracle. This variant
# implements classic HyperLogLog on the portable 60-bit md5 hash
# (text.portable_hash60) with the register state kept in EXACT integers:
#
#   h       = portable_hash60(value)           (60 bits)
#   bucket  = h & (m-1)                        (p low bits, m = 2^p)
#   rho     = 1 + leading-zeros of the remaining w = 60-p bits
#           = (w+1) - bitlength(h >> p)        (bin() + strip, no log2)
#   M_b     = max rho per (group, bucket)      — the registers
#
# Per group the sketch is summarized as two integers any engine recomputes
# bit-for-bit: ``zeros`` (registers never hit) and ``powersum`` =
# sum(2^(w+1 - M_b)) + zeros * 2^(w+1), which is 2^(w+1) * sum(2^-M) —
# the harmonic-mean denominator scaled to an exact bigint (every term a
# power of two, total < m * 2^(w+1) << 2^63). The double estimate
# alpha*m^2 / (powersum / 2^(w+1)) with linear-counting correction is a
# pure function of those integers (hll_portable_estimate); its accuracy
# envelope is asserted in tests, while the driver oracle hash-verifies the
# state itself. Registers merge by MAX — same associative rollup algebra
# as the DataSketches path.


def hll_portable_registers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Per-(group, bucket) max-rho registers on the portable hash."""
    from cypher_for_apache_spark_spark.operators.text import portable_hash60

    m = 1 << p
    w = 60 - p
    h = portable_hash60(F.col(value_col).cast("string"))
    rem = F.shiftright(h, p)
    # bitlength via bin(): minimal binary string, '0' for zero — strip
    # leading zeros so the zero case reads as length 0
    bitlen = F.length(F.regexp_replace(F.bin(rem), "^0+", ""))
    rho = (F.lit(w + 1) - bitlen).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_portable_merge(
    registers: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge register frames up to ``group_cols`` (max per bucket — the
    associative rollup step)."""
    return registers.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_portable_summary(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """(group..., m, zeros, powersum) — the exact-integer sketch state."""
    m = 1 << p
    w = 60 - p
    per_group = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        # shiftleft with a column shift amount needs the SQL form (the
        # python wrapper only takes a literal int)
        F.sum(F.expr(f"shiftleft(1L, {w + 1} - rho)")).alias("_ps_present"),
    )
    zeros = (F.lit(m) - F.col("_present")).cast("long")
    return per_group.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        zeros.alias("zeros"),
        (F.col("_ps_present") + zeros * F.lit(1 << (w + 1)).cast("long")).alias(
            "powersum"
        ),
    )


def hll_portable_estimate(
    summary: DataFrame, p: int = 8, out_col: str = "distinct_est"
) -> DataFrame:
    """Cardinality estimate from the integer state: raw HLL harmonic mean
    with the standard small-range linear-counting correction. Double
    arithmetic — accuracy (not bit-equality) is the contract here; the
    bit-exact surface is (m, zeros, powersum)."""
    m = F.col("m").cast("double")
    w1 = F.lit(float(1 << (60 - p + 1)))
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)
    raw = alpha * m * m * w1 / F.col("powersum").cast("double")
    lc = m * F.log(m / F.col("zeros").cast("double"))
    est = F.when((raw <= 2.5 * m) & (F.col("zeros") > 0), lc).otherwise(raw)
    return summary.withColumn(out_col, est)


def hll_portable_rollup(
    df: DataFrame,
    value_col: str,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """Portable twin of ``distinct_rollup``: registers at ``fine_cols``
    grain, MAX-merged to ``coarse_cols``, summarized to the exact integer
    state. Merging then summarizing equals sketching directly at the
    coarse grain (max is associative) — the property the driver oracle
    exercises by recomputing the coarse state straight from raw rows."""
    fine = hll_portable_registers(df, value_col, fine_cols, p=p)
    merged = hll_portable_merge(fine, coarse_cols)
    return hll_portable_summary(merged, coarse_cols, p=p)


# --------------------------------------------------------------------------
# Fixed-bin histogram sketches (mergeable quantiles)
# --------------------------------------------------------------------------
#
# The quantile sibling of the HLL rollup above: sketch a numeric column
# into a fixed-width bin-count array at the finest grain, then answer any
# coarser quantile by element-wise-summing the arrays — associative, so
# the rollup never rescans raw data. Unlike t-digest/KLL the bins are
# FIXED, which buys exact cross-engine reproducibility (the judge oracle
# recomputes the same integers in DuckDB) at the cost of a fixed value
# range; error is bounded by the bin width.


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    bins: int = 50,
    lo: float = 0.0,
    hi: float = 1.0,
    out_col: str = "hist",
) -> DataFrame:
    """Per-group histogram of ``value_col`` as an ``array<long>`` of
    ``bins`` counts over [lo, hi); out-of-range values clamp to the edge
    bins, nulls are dropped. Two map-side-combinable aggregations: counts
    per (group, bin), then a zero-filled array per group."""
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    bin_idx = F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw))
    per_bin = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bin_idx.alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    as_map = F.map_from_entries(F.collect_list(F.struct("_bin", "_c")))
    filled = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(as_map[i], F.lit(0).cast("long")),
    )
    return per_bin.groupBy(*group_cols).agg(filled.alias(out_col))


def histogram_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "hist",
    bins: Optional[int] = None,
) -> DataFrame:
    """Element-wise-sum fine sketches up to ``group_cols``. The fold is a
    JVM HOF over the collected per-group array list; partial aggregation
    keeps the shuffle narrow (arrays are bins*8 bytes). ``bins`` pins the
    accumulator width like ``histogram_quantile``'s parameter; when
    omitted the group's first sketch seeds the fold — either way the merge
    is a pure plan transformation with NO driver-side action."""
    lst = F.collect_list(F.col(sketch_col))
    summed = lambda acc, h: F.zip_with(acc, h, lambda a, b: a + b)
    if bins is not None:
        merged = F.aggregate(
            lst, F.array_repeat(F.lit(0).cast("long"), bins), summed
        )
    else:
        rest = F.slice(lst, F.lit(2), F.greatest(F.size(lst) - 1, F.lit(0)))
        merged = F.aggregate(rest, F.element_at(lst, 1), summed)
    merged = merged.alias(sketch_col)
    return (
        sketches.groupBy(*group_cols).agg(merged)
        if group_cols
        else sketches.agg(merged)
    )


def histogram_quantile(
    df: DataFrame,
    p: float,
    sketch_col: str = "hist",
    lo: float = 0.0,
    hi: float = 1.0,
    out_col: str = "q_est",
) -> DataFrame:
    """Quantile estimate from a histogram column: the LOWER EDGE of the
    first bin whose cumulative count reaches ceil(p * total) — a
    deterministic integer rule (no interpolation), so any engine
    recomputes it bit-for-bit. Error <= one bin width."""
    h = F.col(sketch_col)
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    target = F.ceil(F.lit(p) * total).cast("long")
    bins = F.size(h)
    width = (F.lit(hi) - F.lit(lo)) / bins
    # fold to (cumulative, found_bin): first index where cum >= target
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(-1).cast("int").alias("idx"),
        F.lit(0).cast("int").alias("i"),
    )
    def step(acc, x):
        cum = acc["cum"] + x
        hit = (acc["idx"] < 0) & (cum >= target)
        return F.struct(
            cum.alias("cum"),
            F.when(hit, acc["i"]).otherwise(acc["idx"]).alias("idx"),
            (acc["i"] + 1).alias("i"),
        )
    folded = F.aggregate(h, acc0, step)
    est = F.when(
        (total > 0) & (folded["idx"] >= 0),
        F.round(F.lit(lo) + folded["idx"] * width, 6),
    )
    return df.withColumn(out_col, est)


# --------------------------------------------------------------------------
# Count-min: mergeable frequency sketch (heavy hitters / frequency caps)
# --------------------------------------------------------------------------

def cm_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch per group, as rows (group..., r, c, cnt): ``depth``
    hash rows of ``width`` counters; an item increments one counter per
    row at column ``portable_hash60(key + ':' + r) % width``.

    Completes the mergeable-sketch family (HLL = distinct counts,
    histogram = quantiles, count-min = frequencies): sketch once at the
    finest grain, then ``cm_merge`` answers any coarser rollup by adding
    counters — associative, so it parallelizes arbitrarily and never
    re-reads raw data. The sparse row form costs at most depth*width rows
    per group and aggregates map-side-combinably; the portable hash makes
    every counter — and every estimate — reproducible by any engine with
    md5 (exact cross-engine oracle, like the portable MinHash/SimHash
    modes)."""
    from cypher_for_apache_spark_spark.operators.text import portable_hash60

    rows = df.select(
        *group_cols,
        F.col(key_col).cast("string").alias("_k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        *group_cols,
        "r",
        F.pmod(
            portable_hash60(
                F.concat(F.col("_k"), F.lit(":"), F.col("r").cast("string"))
            ),
            F.lit(width),
        ).alias("c"),
    )
    return rows.groupBy(*group_cols, "r", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge fine-grain count-min sketches up to ``group_cols`` by adding
    counters (associative rollup — the point of the sketch)."""
    return sketches.groupBy(*group_cols, "r", "c").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated frequency per key: min over the sketch's depth rows of
    the counter each row hashes the key to (the count-min estimate —
    an overcount bounded by collisions, never an undercount). ``keys`` is
    a one-column frame; missing counters read as 0. One equi-join on
    (r, c) against the sketch and a min-aggregation per key."""
    from cypher_for_apache_spark_spark.operators.text import portable_hash60

    probes = keys.select(
        F.col(key_col).cast("string").alias(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        key_col,
        "r",
        F.pmod(
            portable_hash60(
                F.concat(F.col(key_col), F.lit(":"), F.col("r").cast("string"))
            ),
            F.lit(width),
        ).alias("c"),
    )
    joined = probes.join(sketch.select("r", "c", "cnt"), ["r", "c"], "left_outer")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("freq_est")
    )


# --------------------------------------------------------------------------
# Bloom filter (portable): set-membership sketch with the same mergeable
# register pattern as the portable HLL above. Registers are (word_idx,
# bits) rows — 32 bits per word, OR-mergeable, so fine-grained filters
# roll up to coarser grains without revisiting raw data. All hashing is
# md5-derived (Kirsch–Mitzenmacher double hashing: g_i = a + i*b), so a
# SQL engine reproduces every bit — membership answers are exactly
# verifiable cross-engine, FPs included.
# --------------------------------------------------------------------------

def bloom_positions(a: "F.Column", b: "F.Column", m_words: int = 2048, k: int = 4):
    """array<struct<word:int,bit:int>> of the ``k`` bit positions given the
    two md5-derived seeds (``_bloom_ab``). ``a + i*b`` never overflows a
    signed long (a < 2^60, b < 2^32, k small)."""
    m_bits = m_words * 32
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.struct(
            ((a + i * b) % m_bits / 32).cast("int").alias("word"),
            ((a + i * b) % 32).cast("int").alias("bit"),
        ),
    )


def _bloom_ab(df: DataFrame, value_col: str, keep: Sequence[str]) -> DataFrame:
    """Project the 60-bit/32-bit double-hash seeds as REAL columns before
    any lambda touches them: HOF lambdas are interpreted (CodegenFallback,
    no common-subexpression reuse), so seeds left as expressions inside
    ``transform`` would recompute the md5 2k times per value (the same
    trap ``shingle_hash_rows`` documents)."""
    hx = F.md5(F.col(value_col).cast("string"))
    return df.filter(F.col(value_col).isNotNull()).select(
        *keep,
        F.conv(F.substring(hx, 1, 15), 16, 10).cast("long").alias("_a"),
        F.conv(F.substring(hx, 16, 8), 16, 10).cast("long").alias("_b"),
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    m_words: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Per-group Bloom registers ``(group..., word, bits)`` over
    ``value_col``. One explode (k rows per value) + one
    map-side-combinable bit_or — shuffles only (group, int, long)."""
    ab = _bloom_ab(df, value_col, group_cols)
    pos = ab.select(
        *group_cols,
        F.explode(
            bloom_positions(F.col("_a"), F.col("_b"), m_words, k)
        ).alias("_p"),
    )
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), _p.bit)")
    return (
        pos.select(*group_cols, F.col("_p.word").alias("word"), mask.alias("_m"))
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_merge(
    registers: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """OR-merge register frames up to ``group_cols`` (associative)."""
    return registers.groupBy(*group_cols, "word").agg(
        F.bit_or("bits").alias("bits")
    )


def bloom_contains(
    registers: DataFrame,
    queries: DataFrame,
    value_col: str,
    id_cols: Sequence[str],
    m_words: int = 2048,
    k: int = 4,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership test: ``(id_cols..., bloom_hit)`` — true iff ALL k bits
    of the query value are set (the Bloom guarantee: no false negatives;
    false positives at the usual ~(1-e^{-kn/m})^k rate, deterministic
    given the hash). The probe is an equi-join on the int word index
    against a register table of at most ``m_words`` rows — broadcast-size
    by construction regardless of how much data built the filter."""
    ab = _bloom_ab(queries, value_col, id_cols)
    pos = ab.select(
        *id_cols,
        F.explode(
            bloom_positions(F.col("_a"), F.col("_b"), m_words, k)
        ).alias("_p"),
    ).select(*id_cols, F.col("_p.word").alias("word"), F.col("_p.bit").alias("bit"))
    probed = pos.join(F.broadcast(registers), "word", "left")
    ok = (
        F.expr("bits & shiftleft(CAST(1 AS BIGINT), bit)") != 0
    ) & F.col("bits").isNotNull()
    return (
        probed.withColumn("_ok", ok.cast("int"))
        .groupBy(*id_cols)
        .agg((F.sum("_ok") == F.lit(k)).alias(out_col))
    )
