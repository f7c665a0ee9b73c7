"""Integral-image box filter: brute-force parity per image, constant
image closed form, argmax tie-break, window count, small-image skip."""

from __future__ import annotations

import numpy as np
import pandas as pd

from metric_search_spark.functions.image import with_box_stats
from metric_search_spark.sources.synth import (
    decode_image,
    encode_image,
    generate_rows,
)
from tests.sparkutil import get_spark


def _run(rows, r=2):
    spark = get_spark()
    df = spark.createDataFrame(
        pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    )
    return {
        x.image_id: x
        for x in with_box_stats(df, r=r)
        .select(
            "image_id", "box_sum", "box_max", "box_min", "amax_y",
            "amax_x", "n_win",
        )
        .collect()
    }


def test_matches_bruteforce():
    rows = generate_rows(6, seed=42)
    got = _run(rows)
    for row in rows:
        g = (
            decode_image(row["bytes"], row["w"], row["h"], row["fmt"])
            .astype(np.int64)
            .sum(axis=2)
        )
        h, w = g.shape
        wins = np.array(
            [
                [g[y - 2 : y + 3, x - 2 : x + 3].sum() for x in range(2, w - 2)]
                for y in range(2, h - 2)
            ]
        )
        r = got[row["image_id"]]
        assert r.box_sum == wins.sum()
        assert r.box_max == wins.max() and r.box_min == wins.min()
        am = np.unravel_index(wins.argmax(), wins.shape)
        assert (r.amax_y, r.amax_x) == (am[0] + 2, am[1] + 2)
        assert r.n_win == wins.size


def test_constant_image_and_tiebreak():
    img = np.full((10, 12, 3), 7, dtype=np.uint8)
    rows = [
        {
            "image_id": "const",
            "bytes": encode_image(img, "raw"),
            "w": 12,
            "h": 10,
            "fmt": "raw",
        }
    ]
    r = _run(rows)["const"]
    per = 25 * 21  # window sum: 25 px * (7+7+7)
    assert r.box_max == per == r.box_min
    assert r.n_win == (10 - 4) * (12 - 4)
    assert r.box_sum == per * r.n_win
    # all windows tie -> argmax is the first full-support center
    assert (r.amax_y, r.amax_x) == (2, 2)


def test_too_small_image_emits_zero_windows():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    rows = [
        {
            "image_id": "tiny",
            "bytes": encode_image(img, "raw"),
            "w": 4,
            "h": 4,
            "fmt": "raw",
        }
    ]
    r = _run(rows)["tiny"]
    assert (r.n_win, r.box_sum, r.box_max) == (0, 0, 0)
