"""Cross-modal caption-search rollup: keyword filter + caption field
parsing + phash-decoded tile aggregation on crafted rows, and the
byte-sensitivity property (a one-byte caption mutation changes the
output)."""

from __future__ import annotations

import numpy as np

from metric_search_spark.cells import interleave_bits, quantize
from metric_search_spark.functions.spatial import coord_cols
from metric_search_spark.operators.tiling import tile_assign
from pyspark.sql import functions as F

from tests.sparkutil import get_spark


def _phash(x: float, y: float) -> int:
    return int(
        interleave_bits(quantize(np.array([x])), quantize(np.array([y])))[0]
    )


def _rollup(spark, rows):
    df = spark.createDataFrame(rows, "image_id string, caption string, phash long")
    x, y = coord_cols(F.col("phash"))
    hits = df.where(F.col("caption").contains("palette=3")).select(
        F.regexp_extract("caption", r"blobs=(\d+)", 1).cast("long").alias("blobs"),
        x.alias("x"),
        y.alias("y"),
    )
    out = (
        tile_assign(hits, res=4)
        .groupBy("tile")
        .agg(
            F.count("*").cast("long").alias("n_imgs"),
            F.sum("blobs").cast("long").alias("blob_sum"),
        )
    )
    return {r["tile"]: (r["n_imgs"], r["blob_sum"]) for r in out.collect()}


def test_filter_parse_and_tile():
    spark = get_spark()
    rows = [
        ("a", "synthetic scene 0 blobs=2 palette=3", _phash(0.1, 0.1)),
        ("b", "synthetic scene 1 blobs=4 palette=3", _phash(0.11, 0.12)),
        ("c", "synthetic scene 2 blobs=9 palette=5", _phash(0.1, 0.1)),
        ("d", "synthetic scene 3 blobs=1 palette=3", _phash(0.9, 0.9)),
    ]
    got = _rollup(spark, rows)
    # a and b share the res-4 tile (same 1/16 cell); c is filtered out;
    # d lands in its own tile
    assert sorted(got.values()) == [(1, 1), (2, 6)]


def test_caption_byte_sensitivity():
    spark = get_spark()
    base = [("a", "synthetic scene 0 blobs=2 palette=3", _phash(0.5, 0.5))]
    mutated = [("a", "synthetic scene 0 blobs=3 palette=3", _phash(0.5, 0.5))]
    assert _rollup(spark, base) != _rollup(spark, mutated)
