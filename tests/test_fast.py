"""FAST-9 corners: hand-built bright/dark spot cases, the 9-contiguous
boundary (8-run is NOT a corner), threshold strictness, wrap-around runs,
degenerate sizes, and a python brute (explicit circular-run scan, no bit
tricks) over pseudo-random images."""

from __future__ import annotations

import numpy as np

from metric_search_spark.functions.image import FAST_OFFSETS, with_fast_stats
from metric_search_spark.sources.synth import encode_image
from tests.sparkutil import get_spark

_T = 90


def _img_df(spark, imgs):
    rows = [
        (f"img{i}", encode_image(a, "raw"), a.shape[1], a.shape[0], "raw")
        for i, a in enumerate(imgs)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _run(imgs):
    spark = get_spark()
    out = {
        r["image_id"]: (r["n_fast"], r["arc_bits"], r["n_int"])
        for r in with_fast_stats(_img_df(spark, imgs), thresh=_T).collect()
    }
    return [out[f"img{i}"] for i in range(len(imgs))]


def _gray_img(g: np.ndarray) -> np.ndarray:
    """Build an RGB image whose integer grayscale r+g+b equals g (≤ 765)."""
    img = np.zeros((*g.shape, 3), dtype=np.uint8)
    img[:, :, 0] = np.minimum(g, 255)
    img[:, :, 1] = np.minimum(np.maximum(g - 255, 0), 255)
    img[:, :, 2] = np.minimum(np.maximum(g - 510, 0), 255)
    return img


def test_dark_spot_is_corner_everywhere_on_circle():
    # bright field, one dark center pixel: the center sees 16 darker?
    # no — the CENTER pixel is dark, circle pixels bright: all 16 circle
    # pixels are brighter than center+t -> bright corner at the center
    g = np.full((9, 9), 100, dtype=np.int64)
    g[4, 4] = 0
    (n, arc, ni) = _run([_gray_img(g)])[0]
    assert ni == 9
    assert n == 1  # only the center: its full circle is 100 > 0+90
    assert arc == 16  # 16 bright bits at the center, none elsewhere


def test_eight_run_is_not_a_corner_nine_is():
    # center 0; make exactly 8 contiguous circle pixels bright -> no
    # corner; 9 -> corner
    for k, want in ((8, 0), (9, 1)):
        g = np.zeros((9, 9), dtype=np.int64)
        for dx, dy in FAST_OFFSETS[:k]:
            g[4 + dy, 4 + dx] = 200
        (n, _, _) = _run([_gray_img(g)])[0]
        # (arc_bits counts comparisons at EVERY center, so only the
        # corner count is asserted here)
        assert n == want, f"k={k}"


def test_wraparound_run_counts():
    # bright arc spanning the seam: offsets 12..15 and 0..4 (9 contiguous
    # through the wrap)
    g = np.zeros((9, 9), dtype=np.int64)
    for idx in list(range(12, 16)) + list(range(0, 5)):
        dx, dy = FAST_OFFSETS[idx]
        g[4 + dy, 4 + dx] = 200
    (n, _, _) = _run([_gray_img(g)])[0]
    assert n == 1


def test_threshold_is_strict():
    # circle exactly center+t: NOT brighter-than (strict >)
    g = np.zeros((9, 9), dtype=np.int64)
    for dx, dy in FAST_OFFSETS:
        g[4 + dy, 4 + dx] = _T
    (n, arc, _) = _run([_gray_img(g)])[0]
    assert n == 0  # exact tie is not "brighter than" (strict >)
    assert arc == 0  # and contributes no comparison bits at the center
    g2 = g.copy()
    for dx, dy in FAST_OFFSETS:
        g2[4 + dy, 4 + dx] = _T + 1
    (n2, _, _) = _run([_gray_img(g2)])[0]
    assert n2 == 1


def test_small_image_zeroes():
    (n, arc, ni) = _run([np.full((6, 8, 3), 50, dtype=np.uint8)])[0]
    assert (n, arc, ni) == (0, 0, 0)


def _brute(g: np.ndarray, t: int):
    h, w = g.shape
    n = arc = 0
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = g[y, x]
            bright = [g[y + dy, x + dx] > c + t for dx, dy in FAST_OFFSETS]
            dark = [g[y + dy, x + dx] < c - t for dx, dy in FAST_OFFSETS]
            arc += sum(bright) + sum(dark)
            corner = False
            for bits in (bright, dark):
                dbl = bits + bits
                for s in range(16):
                    if all(dbl[s : s + 9]):
                        corner = True
            n += corner
    return n, arc, (h - 6) * (w - 6)


def test_brute_parity_pseudorandom():
    state = 3

    def nxt(m):
        nonlocal state
        state = (state * 48271) % 2147483647
        return state % m

    imgs, want = [], []
    for _ in range(6):
        h, w = 7 + nxt(10), 7 + nxt(10)
        g = np.array(
            [[nxt(300) for _ in range(w)] for _ in range(h)], dtype=np.int64
        )
        imgs.append(_gray_img(g))
        want.append(_brute(g, _T))
    got = _run(imgs)
    assert got == [tuple(map(int, wv)) for wv in want]
