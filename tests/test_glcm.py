"""GLCM texture stats: hand-computed golden, degenerate width, validation."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.functions.image import with_glcm_stats

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _raw_df(spark, img: np.ndarray, image_id: str = "i0"):
    h, w, _ = img.shape
    return spark.createDataFrame(
        [(image_id, bytes(img.astype(np.uint8).ravel()), w, h, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )


def test_glcm_golden_hand_computed(spark):
    # 2×3 image, all channels equal so gray = 3·v; v chosen to hit
    # quantization bins 0, 3, 7 (q = 3v // 96): v=0→0, v=100→3, v=250→7
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = 0    # q 0
    img[0, 1] = 100  # q 3
    img[0, 2] = 250  # q 7
    img[1, 0] = 100  # q 3
    img[1, 1] = 100  # q 3
    img[1, 2] = 0    # q 0
    # directed pairs: (0,3) (3,7) (3,3) (3,0)
    # contrast = 9 + 16 + 0 + 9 = 34
    # energy: each pair distinct count 1 -> 4
    # homog: 840//4 + 840//5 + 840//1 + 840//4 = 210+168+840+210 = 1428
    r = with_glcm_stats(_raw_df(spark, img)).collect()[0]
    assert (r.contrast, r.energy_num, r.homog_840, r.n_pairs) == (
        34, 4, 1428, 4,
    )


def test_glcm_width_one_has_no_pairs(spark):
    img = np.full((3, 1, 3), 200, dtype=np.uint8)
    r = with_glcm_stats(_raw_df(spark, img)).collect()[0]
    assert (r.contrast, r.energy_num, r.homog_840, r.n_pairs) == (0, 0, 0, 0)


def test_glcm_rejects_bad_levels(spark):
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        with_glcm_stats(_raw_df(spark, img), levels=7)


def test_otsu_bimodal_and_constant(spark):
    from metric_search_spark.functions.image import with_otsu_threshold

    # bimodal: half the pixels gray 10, half gray 200 -> any t in (10, 200]
    # scores identically (same split), tie-break picks t = 11
    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[:, :2] = 10
    img[:, 2:] = 200
    rows = with_otsu_threshold(_raw_df(spark, img)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.t_star == 11 and r.w_b == 4 and r.n_px == 8
    # exact score: num = (sb*n - s*wb) = (40*8 - 840*4) = -3040;
    # score = 3040^2 // (4*4) = 577600
    assert r.score_star == 3040 * 3040 // 16

    # constant image: no valid split -> dropped
    flat = np.full((3, 3, 3), 77, dtype=np.uint8)
    assert with_otsu_threshold(_raw_df(spark, flat, "i1")).count() == 0


def test_otsu_large_image_exact_path(spark):
    from metric_search_spark.functions.image import with_otsu_threshold

    # 60x60 = 3600 px > 3400 forces the arbitrary-precision branch;
    # same bimodal structure, same split semantics
    img = np.zeros((60, 60, 3), dtype=np.uint8)
    img[:, :30] = 10
    img[:, 30:] = 200
    r = with_otsu_threshold(_raw_df(spark, img)).collect()[0]
    assert r.t_star == 11 and r.w_b == 1800 and r.n_px == 3600
    n, s, wb, sb = 3600, 1800 * 10 + 1800 * 200, 1800, 1800 * 10
    assert r.score_star == (sb * n - s * wb) ** 2 // (wb * (n - wb))
