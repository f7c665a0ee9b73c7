"""Skyline (Pareto frontier) query over two maximize-dimensions.

The classic database operator (Börzsönyi et al., ICDE 2001): keep every
row not DOMINATED by another — b dominates a when b.x ≥ a.x ∧ b.y ≥ a.y
with at least one strict. The best-tradeoff cut (quality × freshness,
price × rating) of result curation.

Distributed decomposition: dominance is transitive, so the global skyline
is a subset of the union of PER-PARTITION skylines — one mapInPandas
prefilter shrinks each partition to its local frontier (typically
O(log n) of it), and the tiny union is refined once more on a single
partition. No shuffle of the full table, no all-pairs join anywhere.
Coordinates integer-scale to ⌊v·2ˢ⌋ so dominance (pure ≥/> on ints) is
exact and partition-invariant; ties (identical scaled points) all survive
— dominance requires one STRICT inequality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def _frontier(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact skyline of one in-memory batch: sort by (ix desc, iy desc),
    keep rows whose iy exceeds the running max of everything with
    STRICTLY larger ix; within an ix group nothing dominates by x, so the
    group's max-iy rows survive against the prefix and iy-ties co-survive."""
    if len(pdf) == 0:
        return pdf
    pdf = pdf.sort_values(["ix", "iy"], ascending=False, kind="mergesort")
    ix = pdf["ix"].to_numpy()
    iy = pdf["iy"].to_numpy()
    keep = np.zeros(len(pdf), dtype=bool)
    best = -np.inf  # max iy among rows with strictly larger ix
    i = 0
    while i < len(pdf):
        j = i
        while j < len(pdf) and ix[j] == ix[i]:
            j += 1
        gmax = iy[i:j].max()
        # survivors of this ix group: iy == gmax AND gmax > best (a prefix
        # row with larger ix and iy >= gmax dominates otherwise; equal-iy
        # with larger ix dominates too since x is strict)
        if gmax > best:
            keep[i:j] = iy[i:j] == gmax
        best = max(best, gmax)
        i = j
    return pdf[keep]


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    id_col: str = "id",
    scale_bits: int = 20,
) -> DataFrame:
    """Rows on the maximize-maximize Pareto frontier of
    (⌊x·2ˢ⌋, ⌊y·2ˢ⌋). Returns (id, ix, iy) — every non-dominated row,
    including all members of surviving tied points."""
    s = float(1 << scale_bits)
    pts = df.select(
        F.col(id_col).alias("id"),
        F.floor(F.col(x_col) * F.lit(s)).cast("long").alias("ix"),
        F.floor(F.col(y_col) * F.lit(s)).cast("long").alias("iy"),
    )
    schema = "id " + dict(pts.dtypes)["id"] + ", ix long, iy long"

    def local(batches):
        for pdf in batches:
            yield _frontier(pdf)

    cand = pts.mapInPandas(local, schema=schema)
    # The prefilter is sound per ARROW BATCH (a batch-dominated row is
    # globally dominated), but the refine must see the ENTIRE candidate
    # set at once — mapInPandas re-batches at ~10k rows, which would make
    # a >10k-candidate "global" pass silently per-batch. applyInPandas
    # over one constant group delivers the whole set in a single frame;
    # candidates are the union of batch frontiers, tiny for real data.
    return (
        cand.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda pdf: _frontier(pdf.drop(columns=["_g"]))
            if "_g" in pdf.columns
            else _frontier(pdf),
            schema=schema,
        )
    )
