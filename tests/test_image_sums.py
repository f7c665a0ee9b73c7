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


def test_pyramid_golden_hand_computed():
    from metric_search_spark.functions.image import with_pyramid_sums

    spark = get_spark()
    # 2x2 image, equal channels: level 1 is the single pixel
    # ((10+20+30+40)//4) = 25 per channel
    import numpy as np

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0], img[0, 1], img[1, 0], img[1, 1] = 10, 20, 30, 40
    df = spark.createDataFrame(
        [("i0", bytes(img.ravel()), 2, 2, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r.level: r for r in with_pyramid_sums(df, levels=3).collect()}
    # stops at level 1 (1x1 cannot halve again)
    assert set(rows) == {0, 1}
    assert (rows[0].w, rows[0].h, rows[0].sum_r) == (2, 2, 100)
    assert (rows[1].w, rows[1].h) == (1, 1)
    assert rows[1].sum_r == rows[1].sum_g == rows[1].sum_b == 25


def test_pyramid_odd_dims_crop_and_floor():
    from metric_search_spark.functions.image import with_pyramid_sums

    spark = get_spark()
    import numpy as np

    # 3x3: level 1 crops to 1x1 over the top-left 2x2 block;
    # values 1,2,4,8 -> (1+2+4+8)//4 = 3 (floor, not round)
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    img[0, 0], img[0, 1], img[1, 0], img[1, 1] = 1, 2, 4, 8
    img[2, :], img[:, 2] = 255, 255
    df = spark.createDataFrame(
        [("i0", bytes(img.ravel()), 3, 3, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {r.level: r for r in with_pyramid_sums(df, levels=2).collect()}
    assert (rows[1].w, rows[1].h, rows[1].sum_r) == (1, 1, 3)


def test_patch_sums_golden_and_crop():
    from metric_search_spark.functions.image import with_patch_sums

    spark = get_spark()
    import numpy as np

    # 5x9 image with patch=4: grid 1x2, right column (x=8) and bottom row
    # (y=4) cropped; all channels = x so patch sums are analytic
    h, w = 5, 9
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for x in range(w):
        img[:, x] = x
    df = spark.createDataFrame(
        [("i0", bytes(img.ravel()), w, h, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    rows = {(r.py, r.px): r for r in with_patch_sums(df, patch=4).collect()}
    assert set(rows) == {(0, 0), (0, 1)}
    # patch (0,0): x in 0..3 over 4 rows -> sum = 4*(0+1+2+3) = 24
    # patch (0,1): x in 4..7 over 4 rows -> sum = 4*(4+5+6+7) = 88
    assert rows[(0, 0)].sum_r == 24 and rows[(0, 1)].sum_r == 88
    assert rows[(0, 0)].sum_g == 24  # channels identical

    # image smaller than one patch emits nothing
    tiny = np.zeros((3, 3, 3), dtype=np.uint8)
    df2 = spark.createDataFrame(
        [("i1", bytes(tiny.ravel()), 3, 3, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    assert with_patch_sums(df2, patch=4).count() == 0
