"""Harris corner response: sign behavior on crafted images (flat → zero,
straight edge → non-positive, checkerboard/corner → positive), brute-force
per-pixel parity on random images, degenerate-size behavior."""

from __future__ import annotations

import numpy as np

from metric_search_spark.functions.image import with_harris_stats
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


def _brute(img: np.ndarray):
    """Independent per-pixel reimplementation (explicit loops, no slices)."""
    g = img.astype(np.int64).sum(axis=2)
    h, w = g.shape
    if h < 5 or w < 5:
        return (0, 0, 0)
    KX = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    KY = KX.T
    ix = np.zeros((h, w), dtype=np.int64)
    iy = np.zeros((h, w), dtype=np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            win = g[y - 1 : y + 2, x - 1 : x + 2]
            ix[y, x] = int((KX * win).sum())
            iy[y, x] = int((KY * win).sum())
    n_c = 0
    r_max = None
    n = 0
    for y in range(2, h - 2):
        for x in range(2, w - 2):
            wx = ix[y - 1 : y + 2, x - 1 : x + 2]
            wy = iy[y - 1 : y + 2, x - 1 : x + 2]
            sxx = int((wx * wx).sum())
            syy = int((wy * wy).sum())
            sxy = int((wx * wy).sum())
            r = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
            n += 1
            n_c += r > 0
            r_max = r if r_max is None else max(r_max, r)
    return (n_c, r_max, n)


def test_sign_behavior_flat_edge_checker():
    spark = get_spark()
    flat = np.full((6, 6, 3), 55, dtype=np.uint8)
    # straight vertical edge: rank-1 structure tensor → det = 0 →
    # R16 = −tr² ≤ 0 everywhere, never a corner
    edge = np.zeros((8, 8, 3), dtype=np.uint8)
    edge[:, 4:, :] = 200
    # quadrant: two edges meet at the center — a literal corner; the
    # structure tensor has two positive eigenvalues there → R16 > 0.
    # (a 1-px checkerboard would NOT work: Sobel's ±1-column taps land on
    # equal-parity cells and alias the pattern to zero gradient.)
    quad = np.zeros((8, 8, 3), dtype=np.uint8)
    quad[:4, :4, :] = 255
    out = {
        r["image_id"]: r
        for r in with_harris_stats(
            _img_df(spark, [flat, edge, quad])
        ).collect()
    }
    assert (out["img0"]["n_corners"], out["img0"]["resp_max"]) == (0, 0)
    assert out["img1"]["n_corners"] == 0 and out["img1"]["resp_max"] <= 0
    # brute-verified: 9 positive-response pixels around the meeting point
    assert out["img2"]["n_corners"] == 9 and out["img2"]["resp_max"] > 0
    assert out["img2"]["n_int"] == 4 * 4


def test_brute_force_parity_random():
    spark = get_spark()
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for h, w in [(5, 5), (6, 9), (12, 7)]
    ]
    out = {
        r["image_id"]: r for r in with_harris_stats(_img_df(spark, imgs)).collect()
    }
    for i, img in enumerate(imgs):
        want = _brute(img)
        got = out[f"img{i}"]
        assert (got["n_corners"], got["resp_max"], got["n_int"]) == want, i


def test_too_small_image_zeros():
    spark = get_spark()
    tiny = np.full((4, 7, 3), 9, dtype=np.uint8)
    r = with_harris_stats(_img_df(spark, [tiny])).collect()[0]
    assert (r["n_corners"], r["resp_max"], r["n_int"]) == (0, 0, 0)
