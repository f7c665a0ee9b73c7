"""Time-series resampling with last-observation-carried-forward (LOCF).

The gap-fill operator an event-log pipeline needs before any fixed-step
model sees the data: per key, a regular time grid from the key's first
(truncated) timestamp to its last, each grid point carrying the latest
prior-or-equal observation. Composes two existing pieces Spark-first:

- the grid is ``sequence(date_trunc(unit, min ts), max ts, step)`` +
  ``posexplode`` — one row per key from the bounds aggregate, the grid
  materializes executor-side, never on the driver;
- the carry is ``operators/joins.asof_join`` — the union-and-carry
  backward as-of join: ONE hash shuffle of |grid| + |events| rows, no
  point-interval explosion, whole-stage codegen throughout.

The grid position is emitted as an integer index (``pos``, 0-based) so
downstream — and the DuckDB twin — never touch epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resample_locf", "resample_linear"]


def resample_locf(
    events: DataFrame,
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    step: str = "1 hour",
    trunc_unit: str = "hour",
    carry: list[str] | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Per-``by``-key regular grid with LOCF carry.

    Returns (by, pos, ts, <carry>_r ...): one row per grid step from
    ``date_trunc(trunc_unit, min(ts))`` to ``max(ts)`` inclusive; each
    carried column is the value of the latest event with ``event.ts <=
    grid.ts`` (NULL before the first event — possible only in the
    truncation gap before the key's first observation). ``right_order``
    passes through to asof_join for deterministic duplicate-``ts``
    tie-breaks.
    """
    from metric_search_spark.operators.joins import asof_join

    carry = list(carry or [])
    bounds = events.groupBy(by).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_mn"),
        F.max(ts_col).alias("_mx"),
    )
    grid = bounds.select(
        by,
        F.posexplode(
            F.expr(f"sequence(_mn, _mx, interval {step})")
        ).alias("pos", ts_col),
    )
    right = events.select(by, ts_col, *carry)
    out = asof_join(grid, right, on=ts_col, by=by, right_order=right_order)
    return out.select(
        by, F.col("pos").cast("long").alias("pos"), ts_col,
        *[F.col(f"{c}_r") for c in carry],
    )


def _fld(num, den):
    """Exact BIGINT floor division ``⌊num/den⌋`` for den > 0 as a Column:
    ``(num − pmod(num, den)) / den``. ``num − pmod`` is divisible by den,
    so the final `/` is exact integer-valued; no float64 rounding even
    past 2^53, and identical to the DuckDB twin's
    ``(num - ((num % den) + den) % den) // den``."""
    adj = num - F.pmod(num, den)
    return (adj / den).cast("long")


def resample_linear(
    events: DataFrame,
    *,
    by: str = "user_id",
    sec_col: str = "sec",
    value_col: str = "v",
    step_s: int = 3600,
) -> DataFrame:
    """Per-key regular grid with EXACT-integer linear interpolation — the
    companion of :func:`resample_locf` for continuous signals (sensor
    series, trajectory coordinates in µdeg, prices in cents): each grid
    point takes ``v0 + ⌊(v1−v0)·(t−t0) / (t1−t0)⌋`` between its bracketing
    observations, LOCF/NOCB degenerating at the span edges.

    Contract: ``events`` carries one row per (by, sec) — dedup upstream
    (the driver query max-structs duplicates) — with BIGINT ``sec_col``
    (epoch seconds) and BIGINT ``value_col``. The grid runs from
    ``⌊min sec / step⌋·step`` to ``max sec`` inclusive, ``pos`` 0-based.
    All arithmetic is int64 with explicit floor division (:func:`_fld`),
    so a DuckDB twin replaying the same formula is bit-identical.

    Spark-first plan: ONE bounds aggregate → ``sequence``/``posexplode``
    grid (executor-side, never the driver), then TWO union-and-carry
    as-of joins (operators/joins.asof_join — each one hash shuffle, no
    point-interval explosion; like resample_locf, a key's grid length is
    its time span / step — size the step to the span, a years-long key
    at 1 s steps is the caller's explosion): the backward join brackets
    (t0, v0); the
    forward bracket reuses the SAME backward operator on negated seconds
    (latest −t_r ≤ −t ⟺ earliest t_r ≥ t). Returns
    (by, pos, sec, v) — v is NULL only for a key with zero events, which
    the bounds aggregate already excludes, i.e. never.
    """
    from metric_search_spark.operators.joins import asof_join

    bounds = events.groupBy(by).agg(
        (F.min(sec_col) - F.pmod(F.min(sec_col), F.lit(step_s))).alias("_mn"),
        F.max(sec_col).alias("_mx"),
    )
    grid = bounds.select(
        by,
        F.posexplode(F.expr(f"sequence(_mn, _mx, {step_s})")).alias(
            "pos", "sec"
        ),
    )
    back = events.select(
        by,
        F.col(sec_col).alias("sec"),
        F.col(sec_col).alias("_t0"),
        F.col(value_col).alias("_v0"),
    )
    g1 = asof_join(grid, back, on="sec", by=by)
    fwd = events.select(
        by,
        (-F.col(sec_col)).alias("_nsec"),
        F.col(sec_col).alias("_t1"),
        F.col(value_col).alias("_v1"),
    )
    g2 = asof_join(
        g1.withColumn("_nsec", -F.col("sec")), fwd, on="_nsec", by=by
    )
    t, t0, v0 = F.col("sec"), F.col("_t0_r"), F.col("_v0_r")
    t1, v1 = F.col("_t1_r"), F.col("_v1_r")
    interp = (
        F.when(t0.isNull(), v1)  # truncation gap before the first event
        .when(t1.isNull(), v0)  # cannot happen (grid max = max sec); total
        .when(t1 == t0, v0)  # grid point ON an observation
        .otherwise(v0 + _fld((v1 - v0) * (t - t0), t1 - t0))
    )
    return g2.select(
        by,
        F.col("pos").cast("long").alias("pos"),
        F.col("sec").cast("long").alias("sec"),
        interp.cast("long").alias("v"),
    )
