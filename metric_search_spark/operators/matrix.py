"""Pairwise distance matrix — the reference's ``Matrix<recType, Metric>``
(/root/reference/details/matrix.cpp:27-88: symmetric container storing the
upper triangle) as a theta self-join emitting (i, j, dist) edge rows with
i < j. Edge rows, not a materialized matrix: adjacency matrices do not scale
(SURVEY.md §1.5); downstream graph ops consume the edge list.

It is O(n²) by construction (as in the reference) — intended for bounded
blocks (a cell, a candidate set), not whole tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metric_search_spark.functions.vector import l2_dist_col

__all__ = ["pairwise_matrix"]


def pairwise_matrix(
    df: DataFrame,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    dist_col_fn=None,
) -> DataFrame:
    """Upper-triangle pairwise distances: (i, j, dist) for i < j.

    ``dist_col_fn(a_vec_col, b_vec_col) -> Column`` defaults to L2. Column
    expressions keep it JVM-side; for non-SQL metrics pass a numpy path via
    the joins module instead.
    """
    if dist_col_fn is None:
        dist_col_fn = l2_dist_col
    a = df.select(
        F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("_va")
    )
    b = df.select(
        F.col(id_col).alias("j"), F.col(vec_col).cast("array<double>").alias("_vb")
    )
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", dist_col_fn(F.col("_va"), F.col("_vb")).alias("dist"))
    )
