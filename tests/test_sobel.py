"""Sobel edge stats: hand-computed responses on ramp/constant images,
degenerate-size behavior, and exact-integer output types."""

from __future__ import annotations

import numpy as np

from metric_search_spark.functions.image import with_sobel_stats
from metric_search_spark.sources.synth import encode_image
from tests.sparkutil import get_spark


def _img_df(spark, imgs):
    rows = [
        (f"img{i}", encode_image(a, "raw"), a.shape[1], a.shape[0], "raw")
        for i, a in enumerate(imgs)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_ramp_constant_and_step():
    spark = get_spark()
    # ramp: red channel = x → gray slope 1 → |gx| = 8 at every interior px
    ramp = np.zeros((5, 5, 3), dtype=np.uint8)
    ramp[:, :, 0] = np.arange(5, dtype=np.uint8)[None, :]
    # constant: zero response everywhere
    const = np.full((6, 4, 3), 37, dtype=np.uint8)
    # vertical step at x=2 (gray 0 → 300): columns x=1,2 of the interior
    # see the step; Sobel row weights sum to 4 → |gx| = 1200 there
    step = np.zeros((5, 5, 3), dtype=np.uint8)
    step[:, 2:, :] = 100
    out = {
        r["image_id"]: r
        for r in with_sobel_stats(_img_df(spark, [ramp, const, step])).collect()
    }
    r = out["img0"]
    assert (r["edge_sum"], r["edge_max"], r["n_int"]) == (8 * 9, 8, 9)
    r = out["img1"]
    assert (r["edge_sum"], r["edge_max"], r["n_int"]) == (0, 0, 8)
    r = out["img2"]
    # interior x∈{1,2,3}: x=1 and x=2 straddle the step (|gx|=4·300),
    # x=3 is flat on the high side
    assert (r["edge_sum"], r["edge_max"], r["n_int"]) == (2 * 3 * 1200, 1200, 9)


def test_too_small_image_yields_zeros():
    spark = get_spark()
    tiny = np.full((2, 2, 3), 200, dtype=np.uint8)
    (r,) = with_sobel_stats(_img_df(spark, [tiny])).collect()
    assert (r["edge_sum"], r["edge_max"], r["n_int"]) == (0, 0, 0)


def test_channel_hist_matches_numpy_and_is_sparse():
    """Histogram rows equal a direct numpy rebin of the decoded images;
    zero bins are absent; per-channel counts sum to w*h."""
    import numpy as np
    import pandas as pd

    from metric_search_spark.functions.image import with_channel_hist
    from metric_search_spark.sources.synth import decode_image, generate_rows

    spark = get_spark()
    rows = generate_rows(64, seed=7)
    pdf = pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    got = {}
    for r in with_channel_hist(spark.createDataFrame(pdf), bins=8).collect():
        got[(r.image_id, r.channel, r.bin)] = r.cnt
        assert r.cnt > 0
    exp = {}
    per_img_area = {}
    for r in rows:
        img = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        per_img_area[r["image_id"]] = r["w"] * r["h"]
        for c in range(3):
            bc = np.bincount(img[:, :, c].ravel() // 32, minlength=8)
            for b in np.nonzero(bc)[0]:
                exp[(r["image_id"], c, int(b))] = int(bc[b])
    assert got == exp
    sums = {}
    for (iid, c, _b), cnt in got.items():
        sums[(iid, c)] = sums.get((iid, c), 0) + cnt
    assert all(v == per_img_area[iid] for (iid, _c), v in sums.items())


def test_channel_hist_bins_guard():
    import pytest as _pytest

    from metric_search_spark.functions.image import with_channel_hist

    spark = get_spark()
    df = spark.range(0)
    with _pytest.raises(ValueError, match="divide 256"):
        with_channel_hist(df, bins=7)
