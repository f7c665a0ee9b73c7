"""LBP histogram goldens (flat ties, bright-pixel inversion, ramp
pattern arithmetic) and hard-negative mining label semantics."""

from __future__ import annotations

import numpy as np

from metric_search_spark.functions.image import with_lbp_hist
from metric_search_spark.operators.ann import hard_negative_topk
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


def test_lbp_goldens():
    spark = get_spark()
    # flat: every neighbor ties (>=) -> pattern 255 at all interior px
    flat = np.full((5, 5, 3), 100, dtype=np.uint8)
    # one bright pixel in a flat field: that pixel sees all neighbors
    # below it -> pattern 0; every OTHER interior pixel still ties or
    # sees the bright one -> 255
    bright = np.full((5, 5, 3), 100, dtype=np.uint8)
    bright[2, 2, :] = 200
    # x-ramp: dx=+1 neighbors greater (bits 2,3,4), dx=0 tie (bits 1,5),
    # dx=-1 smaller -> pattern 4+8+16+2+32 = 62 everywhere
    ramp = np.zeros((5, 6, 3), dtype=np.uint8)
    ramp[:, :, 0] = np.arange(6, dtype=np.uint8)[None, :]
    rows = with_lbp_hist(_img_df(spark, [flat, bright, ramp])).collect()
    got = {(r["image_id"], r["pattern"]): r["cnt"] for r in rows}
    assert got[("img0", 255)] == 9 and len(
        [k for k in got if k[0] == "img0"]
    ) == 1
    assert got[("img1", 0)] == 1 and got[("img1", 255)] == 8
    assert got[("img2", 62)] == 3 * 4 and len(
        [k for k in got if k[0] == "img2"]
    ) == 1


def test_hard_negative_label_semantics():
    spark = get_spark()
    # anchor 0 (label A) has an exact same-label twin (id 1) and a
    # slightly-off different-label vector (id 2): the twin must be
    # EXCLUDED and id 2 must rank 1.
    rows = [
        (0, [1.0, 0.0], "A"),
        (1, [1.0, 0.0], "A"),
        (2, [0.9, 0.1], "B"),
        (3, [0.0, 1.0], "B"),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>, label string")
    got = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in hard_negative_topk(df, k=2).collect()
    }
    assert got[(0, 1)] == 2 and got[(0, 2)] == 3
    # symmetric view: anchor 2's hardest negatives are the A vectors
    assert got[(2, 1)] in (0, 1)
    # k truncation: only 2 wrong-label rows exist for label-A anchors
    assert (0, 3) not in got
