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

__all__ = ["resample_locf"]


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
