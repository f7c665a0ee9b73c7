"""Exact distributed quantiles by rank selection.

The analytics staple next to cube/rollup: per-group p50/p90/p99 of a
measure. This is the EXACT tier — the type-1 (lower) quantile, defined as
the value at 1-indexed rank ⌈q·n⌉ of the group's ascending sort — chosen
over interpolating definitions because it is engine-independent to the
bit: rank arithmetic is ⌈double·bigint⌉ on identical IEEE inputs and the
answer is an actual data value, never a blend of two (interpolation
formulas differ subtly across engines — a+(b−a)f vs (1−f)a+fb — and would
reintroduce last-ulp drift).

Scale shape: one shuffle — the per-group sort window. row_number +
count-over-partition compile into a single Window over one Exchange on
the group key; the quantile filter then keeps ⌈q·n⌉-ranked rows only. At
10⁹ rows per group the full sort is the honest cost of EXACT quantiles
(any cheaper answer is approximate by definition); for the sketch tier at
that scale Spark's native approx_percentile / the KMV module apply — this
operator is the ground truth they are judged against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_quantiles", "mad_outliers", "equiwidth_histogram"]


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    *,
    group_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-group exact type-1 quantiles. Returns (group_cols..., q, val)
    with one row per group × quantile; ``val`` is the group's value at
    ascending rank ⌈q·n⌉ (q ∈ (0, 1]; q=1 is the max, q→0⁺ the min).

    ``tie_col``: optional unique column appended to the sort for a total
    order — the RETURNED value is identical either way (equal values are
    interchangeable at a rank), it only pins WHICH physical row wins for
    engines that care.
    """
    if not qs:
        raise ValueError("exact_quantiles: need at least one quantile")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} not in (0, 1]")
    gc = list(group_cols or [])
    order = [F.col("val").asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(*gc).orderBy(*order)
    wn = Window.partitionBy(*gc)
    ranked = df.select(
        *gc,
        F.col(value_col).alias("val"),
        *([F.col(tie_col)] if tie_col else []),
    ).withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(*gc, "val", "_rn", "_n", F.explode(qarr).alias("q"))
        .where(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
        .select(*gc, "q", "val")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flagging by median absolute deviation:
    keep rows with |v − median| > k·MAD, where both medians are the exact
    type-1 (rank ⌈n/2⌉) statistics of this module. Rank-based medians make
    the whole pipeline engine-deterministic: med, MAD, and v are actual
    data values copied bit-for-bit, and sub/abs/mul are correctly-rounded
    IEEE on identical inputs — so the strict-> comparison needs no epsilon
    story at all (unlike mean/stddev z-scores, whose sums are
    order-dependent). MAD = 0 (constant-majority groups) flags every
    non-median value, the conventional reading.

    Returns the input columns plus med, mad, dev (= |v − med|).
    Scale: three group-key shuffles (rank-median, deviation rank-median,
    broadcast-able stat re-joins) — each map-side bounded; the honest
    exact-tier cost, same note as exact_quantiles."""
    gc = list(group_cols or [])
    med = exact_quantiles(df, value_col, [0.5], group_cols=gc).select(
        *gc, F.col("val").alias("med")
    )
    join_on = gc if gc else None
    dev = (
        df.join(F.broadcast(med), join_on) if gc else df.crossJoin(F.broadcast(med))
    ).withColumn("dev", F.abs(F.col(value_col) - F.col("med")))
    madq = exact_quantiles(dev, "dev", [0.5], group_cols=gc).select(
        *gc, F.col("val").alias("mad")
    )
    out = (
        dev.join(F.broadcast(madq), join_on)
        if gc
        else dev.crossJoin(F.broadcast(madq))
    )
    return out.where(F.col("dev") > F.lit(float(k)) * F.col("mad"))


def equiwidth_histogram(
    df: DataFrame,
    value_col: str,
    bins: int,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group equi-width histogram over the group's own [min, max]:
    bin = min(⌊(v − lo)·bins/(hi − lo)⌋, bins−1), counts per (group, bin)
    including a 0-count row for every empty bin (the shape downstream
    plotting/drift checks expect). Degenerate groups (hi = lo) collapse
    into bin 0. Engine-deterministic: lo/hi are exact min/max data values
    and the bin arithmetic is correctly-rounded IEEE on identical inputs —
    the same no-epsilon argument as mad_outliers; values landing exactly
    on an interior edge go to the upper bin in both engines by the same
    ⌊·⌋.

    Scale: one map-side-combined (group → lo, hi) aggregate broadcast back
    onto the rows, then one map-side-combined (group, bin) count — two
    tiny shuffles, no sort anywhere (the cheap-tier complement to
    exact_quantiles' full per-group sort)."""
    if bins < 1:
        raise ValueError(f"bins {bins} must be >= 1")
    gc = list(group_cols or [])
    bounds = df.groupBy(*gc).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    joined = (
        df.join(F.broadcast(bounds), gc) if gc else df.crossJoin(F.broadcast(bounds))
    )
    width = F.col("_hi") - F.col("_lo")
    raw = F.floor(
        (F.col(value_col) - F.col("_lo")) * F.lit(float(bins)) / width
    )
    binc = (
        F.when(width == 0, F.lit(0))
        .otherwise(F.least(raw, F.lit(bins - 1)))
        .cast("long")
    )
    counts = joined.select(*gc, binc.alias("bin")).groupBy(*gc, "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    grid = bounds.select(
        *gc, F.explode(F.sequence(F.lit(0), F.lit(bins - 1)).cast("array<long>")).alias("bin")
    )
    return grid.join(counts, gc + ["bin"], "left").select(
        *gc, "bin", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    )


def weighted_median(
    df: DataFrame,
    *,
    by: str = "g",
    val_col: str = "v",
    w_col: str = "w",
) -> DataFrame:
    """Per-group weighted LOWER median over integer weights: the
    smallest value v with ``2·Σ_{u≤v} w(u) ≥ Σ w`` — the robust
    aggregator (weighted by trust scores, durations, byte counts) whose
    threshold test is exact integer algebra, so ties and repeated
    values cannot flip it across engines or partitionings.

    Plan: ONE RANGE-frame cumulative sum ordered by value (a RANGE
    frame absorbs duplicate values wholesale — the cut is defined at
    value granularity, so tie order inside a value is irrelevant by
    construction), a broadcast-sized per-group total, and a min()
    aggregate over qualifying rows. Returns (by, wmed, wtot)."""
    cum = F.sum(w_col).over(
        Window.partitionBy(by)
        .orderBy(val_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    tot = F.sum(w_col).over(Window.partitionBy(by))
    return (
        df.select(
            by,
            F.col(val_col).alias("_v"),
            cum.alias("_c"),
            tot.alias("_t"),
        )
        .where(2 * F.col("_c") >= F.col("_t"))
        .groupBy(by)
        .agg(
            F.min("_v").cast("long").alias("wmed"),
            F.max("_t").cast("long").alias("wtot"),
        )
    )


__all__.append("weighted_median")
