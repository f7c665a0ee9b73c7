"""Vector math over ``array<double>`` columns as pure Column expressions.

These are the SQL-expressible twins of the numpy metric kernels
(core/metrics.py ← reference n-api/metric_distance/details/Standards.cpp):
they stay JVM-side inside whole-stage codegen, and each has a DuckDB SQL
string twin (``*_sql``) used by the correctness oracle. Left-fold summation
order is identical on both sides (Spark ``aggregate`` and DuckDB
``list_sum`` both reduce element order), so results agree to the last ulp on
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot_col",
    "norm_col",
    "l2_dist_col",
    "l1_dist_col",
    "cosine_sim_col",
    "l2_dist_sql",
    "l1_dist_sql",
    "cosine_sim_sql",
]


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def l2_dist_col(a: Column, b: Column) -> Column:
    """sqrt(Σ(aᵢ−bᵢ)²) — Standards.cpp:28-40."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )


def l1_dist_col(a: Column, b: Column) -> Column:
    """Σ|aᵢ−bᵢ| — Standards.cpp:56-68."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0.0), lambda s, v: s + v
    )


def cosine_sim_col(a: Column, b: Column) -> Column:
    """dot/(‖a‖·‖b‖) — similarity, the reference's quirk (Standards.cpp:84-96)."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


# ------------------------------------------------------------- DuckDB twins
# Each takes SQL expressions for two list-typed columns; elements are cast to
# DOUBLE first so float32 storage doesn't change the arithmetic.


def _zipped_sq(a: str, b: str) -> str:
    return (
        f"list_transform(list_zip({a}, {b}), "
        f"z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) "
        f"* (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))"
    )


def l2_dist_sql(a: str, b: str) -> str:
    return f"sqrt(list_sum({_zipped_sq(a, b)}))"


def l1_dist_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"z -> abs(CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))))"
    )


def cosine_sim_sql(a: str, b: str) -> str:
    dot = (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
    )
    na = f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"({dot} / ({na} * {nb}))"
