"""Per-image blob CCL and gradient-orientation histograms: hand-computed
goldens (two separated blobs, diagonal NON-connectivity under 4-adjacency,
ramp orientations), empty-foreground zeros, and mass-conservation
invariants."""

from __future__ import annotations

import numpy as np

from metric_search_spark.functions.image import (
    with_blob_stats,
    with_orient_hist,
)
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


def test_blob_goldens():
    spark = get_spark()
    # two separated 2x2 blobs (255*3 = 765 >= 600)
    two = np.zeros((6, 8, 3), dtype=np.uint8)
    two[1:3, 1:3, :] = 255
    two[3:5, 5:7, :] = 255
    # diagonal touch only: NOT connected under 4-adjacency -> 2 blobs
    diag = np.zeros((5, 5, 3), dtype=np.uint8)
    diag[1, 1, :] = 255
    diag[2, 2, :] = 255
    # all background
    dark = np.full((5, 5, 3), 60, dtype=np.uint8)
    # L-shaped single blob of 5 px
    ell = np.zeros((6, 6, 3), dtype=np.uint8)
    ell[1:4, 1, :] = 255
    ell[3, 1:4, :] = 255
    out = {
        r["image_id"]: r
        for r in with_blob_stats(
            _img_df(spark, [two, diag, dark, ell])
        ).collect()
    }
    assert (out["img0"]["n_blobs"], out["img0"]["max_blob"],
            out["img0"]["fg_px"]) == (2, 4, 8)
    assert (out["img1"]["n_blobs"], out["img1"]["max_blob"]) == (2, 1)
    assert (out["img2"]["n_blobs"], out["img2"]["max_blob"],
            out["img2"]["fg_px"]) == (0, 0, 0)
    assert (out["img3"]["n_blobs"], out["img3"]["max_blob"]) == (1, 5)


def test_orient_goldens_and_conservation():
    spark = get_spark()
    # ramp brightening to the right: gx = 8 > 0, gy = 0 everywhere ->
    # quadrant 0, |gy| <= |gx| -> bin 0, weight 8 per interior pixel
    ramp = np.zeros((5, 6, 3), dtype=np.uint8)
    ramp[:, :, 0] = np.arange(6, dtype=np.uint8)[None, :]
    # ramp brightening downward: gy = 8 > 0, gx = 0 -> quadrant 0 but
    # |gy| > |gx| -> bin 1
    vert = np.zeros((6, 5, 3), dtype=np.uint8)
    vert[:, :, 0] = np.arange(6, dtype=np.uint8)[:, None]
    # flat: zero gradient -> bin 0 with weight 0 (defined convention)
    flat = np.full((5, 5, 3), 77, dtype=np.uint8)
    rows = with_orient_hist(_img_df(spark, [ramp, vert, flat])).collect()
    got = {(r["image_id"], r["bin"]): (r["n_px"], r["wsum"]) for r in rows}
    assert got[("img0", 0)] == (3 * 4, 8 * 12)
    assert ("img0", 1) not in got
    assert got[("img1", 1)] == (4 * 3, 8 * 12)
    assert got[("img2", 0)] == (9, 0)
    # conservation on random images: per-image n_px sums to the interior,
    # wsum to the Sobel L1 edge_sum
    rng = np.random.default_rng(13)
    imgs = [rng.integers(0, 256, (8, 7, 3), dtype=np.uint8) for _ in range(3)]
    from metric_search_spark.functions.image import with_sobel_stats

    hist = with_orient_hist(_img_df(spark, imgs)).collect()
    sob = {
        r["image_id"]: r
        for r in with_sobel_stats(_img_df(spark, imgs)).collect()
    }
    for i in range(3):
        mine = [r for r in hist if r["image_id"] == f"img{i}"]
        assert sum(r["n_px"] for r in mine) == sob[f"img{i}"]["n_int"]
        assert sum(r["wsum"] for r in mine) == sob[f"img{i}"]["edge_sum"]
