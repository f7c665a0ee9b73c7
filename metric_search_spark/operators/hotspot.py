"""Emerging hotspot analysis: per-tile Mann–Kendall trend over time bins.

The space-time-cube operator (the shape of ArcGIS "Emerging Hot Spot
Analysis", integerized): events aggregate into (tile × time-bin) counts,
each occupied tile's ZERO-FILLED bin series gets the Mann–Kendall S
statistic S = Σ_{i<j} sign(c_j − c_i) — positive S = intensifying,
negative = cooling — plus the total and last-bin counts a triage query
reads. Everything is exact int64: epoch-microsecond binning with integer
multiply-divide, counts, and sign sums, so a DuckDB twin matches with no
tolerance.

Zero-filling matters: a tile absent from early bins must contribute
rising signs, not a shorter series — the series completes by exploding a
bin sequence per occupied tile and left-joining the counts.

100-TB shape: ONE map-side-combined (tile, bin) count over the events is
the only full-data pass (the global time extent rides along as a 1-row
broadcast, no driver round-trip); everything after runs on the occupied
(tile × bins) table, ≤ 4^res·B rows regardless of input size. The pair
enumeration is a per-tile self-join (B(B−1)/2 rows per tile, B a small
constant) on the tile equi-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import cell_from_cxy_col, quantize_col

__all__ = ["emerging_hotspots"]


def emerging_hotspots(
    df: DataFrame,
    res: int,
    bins: int,
    *,
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Returns (tile, s_stat, cnt_total, cnt_last) per occupied tile; see
    module docstring. Bin k = (us − min_us)·bins ÷ (max_us − min_us + 1),
    exact integer arithmetic (the +1 keeps the max event in bin bins−1).
    """
    if not 1 <= res <= 27:
        raise ValueError(f"resolution {res} out of [1, 27]")
    if bins < 2:
        raise ValueError(f"bins {bins} must be >= 2")
    shift = 31 - res
    # session tz is UTC, so the NTZ→TZ cast is the identity and
    # unix_micros matches DuckDB's epoch_us
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    mm = df.agg(F.min(us).alias("_lo"), F.max(us).alias("_hi"))
    counts = (
        df.crossJoin(F.broadcast(mm))
        .select(
            F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("cx"),
            F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("cy"),
            # exact integer floor-div: (num − num%den)/den is an exact
            # multiple, so the double division is lossless (a bare long/long
            # division is a DOUBLE in Spark and can round across a bin edge)
            (
                (
                    (us - F.col("_lo")) * bins
                    - F.pmod(
                        (us - F.col("_lo")) * bins,
                        F.col("_hi") - F.col("_lo") + 1,
                    )
                )
                / (F.col("_hi") - F.col("_lo") + 1)
            ).cast("long").alias("bin"),
        )
        .groupBy("cx", "cy", "bin")
        .agg(F.count("*").alias("cnt"))
        .withColumn("tile", cell_from_cxy_col(F.col("cx"), F.col("cy"), res))
        .select("tile", "bin", "cnt")
    )
    grid = (
        counts.select("tile")
        .distinct()
        .select("tile", F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"))
        .join(counts, ["tile", "bin"], "left")
        .select("tile", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    a = grid.select("tile", F.col("bin").alias("bi"), F.col("cnt").alias("ci"))
    b = grid.select("tile", F.col("bin").alias("bj"), F.col("cnt").alias("cj"))
    pairs = a.join(b, "tile").where(F.col("bi") < F.col("bj"))
    s = pairs.groupBy("tile").agg(
        F.sum(F.signum(F.col("cj") - F.col("ci")).cast("long")).alias("s_stat")
    )
    tot = grid.groupBy("tile").agg(
        F.sum("cnt").alias("cnt_total"),
        F.sum(F.when(F.col("bin") == bins - 1, F.col("cnt")).otherwise(0)).alias(
            "cnt_last"
        ),
    )
    return s.join(tot, "tile").select("tile", "s_stat", "cnt_total", "cnt_last")
