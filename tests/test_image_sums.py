"""functions/image.with_channel_sums — exact int64 channel sums.

Pins: sums are exact (agree with a local numpy decode), associative under
repartitioning, and consistent with with_image_stats' float means
(sum/npx == mean to float tolerance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from metric_search_spark.functions.image import with_channel_sums, with_image_stats
from metric_search_spark.sources.synth import decode_image, generate_rows
from tests.sparkutil import get_spark


def _df(n=48):
    spark = get_spark()
    rows = generate_rows(n, seed=9)
    pdf = pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt", "phash"]]
    return spark.createDataFrame(pdf), rows


def test_sums_exact_vs_local_decode():
    df, rows = _df()
    got = {
        r["image_id"]: (r["sum_r"], r["sum_g"], r["sum_b"], r["npx"])
        for r in with_channel_sums(df).collect()
    }
    for r in rows:
        img = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        want = tuple(
            int(x) for x in img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        ) + (r["w"] * r["h"],)
        assert got[r["image_id"]] == want


def test_partitioning_invariance_and_mean_consistency():
    df, _ = _df()
    a = sorted(
        (r["image_id"], r["sum_r"], r["npx"])
        for r in with_channel_sums(df).collect()
    )
    b = sorted(
        (r["image_id"], r["sum_r"], r["npx"])
        for r in with_channel_sums(df.repartition(7)).collect()
    )
    assert a == b
    stats = {
        r["image_id"]: r["mean_r"] for r in with_image_stats(df).collect()
    }
    sums = with_channel_sums(df).collect()
    for r in sums:
        assert abs(r["sum_r"] / r["npx"] - stats[r["image_id"]]) < 1e-9
