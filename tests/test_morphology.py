"""Morphology + histogram equalization: naive per-pixel ground truth,
structural invariants, tiny-image edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metric_search_spark.functions.image import (
    with_equalized_hist,
    with_morphology_stats,
)
from metric_search_spark.sources.synth import decode_image, generate_rows

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _naive_morph(g: np.ndarray, thresh: int = 384):
    h, w = g.shape
    mask_cnt = int((g >= thresh).sum())
    er = di = med_sum = n = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            nb = sorted(
                int(g[y + dy, x + dx]) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            )
            er += all(v >= thresh for v in nb)
            di += any(v >= thresh for v in nb)
            med_sum += nb[4]
            n += 1
    return mask_cnt, er, di, med_sum, n


def test_morphology_matches_naive(spark):
    rows = generate_rows(6, seed=5)
    pdf = pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    got = {
        r["image_id"]: (
            r["mask_cnt"], r["eroded_cnt"], r["dilated_cnt"],
            r["med_sum"], r["n_int"],
        )
        for r in with_morphology_stats(spark.createDataFrame(pdf)).collect()
    }
    for r in rows:
        g = decode_image(r["bytes"], r["w"], r["h"], r["fmt"]).astype(
            np.int64
        ).sum(axis=2)
        assert got[r["image_id"]] == _naive_morph(g)


def test_morphology_order(spark):
    """Erosion ⊆ mask-interior ⊆ dilation; median bounded by neighborhood."""
    rows = generate_rows(12, seed=9)
    pdf = pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    for r in with_morphology_stats(spark.createDataFrame(pdf)).collect():
        assert r["eroded_cnt"] <= r["dilated_cnt"]
        assert 0 <= r["med_sum"] <= 765 * r["n_int"]


def test_morphology_tiny_image(spark):
    """Below 3×3 there is no interior: zeros everywhere but mask_cnt."""
    img = np.full((2, 2, 3), 200, dtype=np.uint8)  # gray 600 >= 384
    pdf = pd.DataFrame(
        {
            "image_id": ["t"],
            "bytes": [img.tobytes()],
            "w": [2],
            "h": [2],
            "fmt": ["raw"],
        }
    )
    r = with_morphology_stats(get_spark().createDataFrame(pdf)).collect()[0]
    assert (r["mask_cnt"], r["eroded_cnt"], r["dilated_cnt"], r["med_sum"],
            r["n_int"]) == (4, 0, 0, 0, 0)


def _naive_equalize(g: np.ndarray) -> dict[int, int]:
    hist = np.bincount(g.ravel(), minlength=766)
    cdf = np.cumsum(hist)
    n = int(cdf[-1])
    occ = np.nonzero(hist)[0]
    cdf_min = int(cdf[occ[0]])
    out: dict[int, int] = {}
    for v in occ:
        eq = 0 if n == cdf_min else int((cdf[v] - cdf_min) * 255 // (n - cdf_min))
        out[eq] = out.get(eq, 0) + int(hist[v])
    return out


def test_equalize_matches_naive_and_preserves_mass(spark):
    rows = generate_rows(6, seed=5)
    pdf = pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    got: dict[str, dict[int, int]] = {}
    for r in with_equalized_hist(spark.createDataFrame(pdf)).collect():
        got.setdefault(r["image_id"], {})[r["eq_level"]] = r["cnt"]
    for r in rows:
        g = decode_image(r["bytes"], r["w"], r["h"], r["fmt"]).astype(
            np.int64
        ).sum(axis=2)
        want = _naive_equalize(g)
        assert got[r["image_id"]] == want
        assert sum(want.values()) == r["w"] * r["h"]  # mass preserved
        assert all(0 <= k <= 255 for k in want)


def test_equalize_constant_image(spark):
    img = np.full((4, 4, 3), 99, dtype=np.uint8)
    pdf = pd.DataFrame(
        {
            "image_id": ["c"],
            "bytes": [img.tobytes()],
            "w": [4],
            "h": [4],
            "fmt": ["raw"],
        }
    )
    rows = with_equalized_hist(get_spark().createDataFrame(pdf)).collect()
    assert [(r["eq_level"], r["cnt"]) for r in rows] == [(0, 16)]


def test_equalize_full_range_stretch(spark):
    """A two-level image maps its min to 0 and its max to 255 — the
    contrast stretch that makes equalization worth running."""
    img = np.zeros((2, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 130
    pdf = pd.DataFrame(
        {
            "image_id": ["s"],
            "bytes": [img.tobytes()],
            "w": [8],
            "h": [2],
            "fmt": ["raw"],
        }
    )
    rows = with_equalized_hist(get_spark().createDataFrame(pdf)).collect()
    assert sorted((r["eq_level"], r["cnt"]) for r in rows) == [(0, 8), (255, 8)]
