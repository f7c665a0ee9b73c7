"""functions/image.augmented + with_gray_moments: hand goldens on an
asymmetric image, dihedral group identities, moment exactness, and the
affine-remap oracle identity the driver query relies on."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.functions.image import augmented, with_gray_moments
from metric_search_spark.sources.synth import decode_image, encode_image
from tests.sparkutil import get_spark


def _img():
    # 2 rows x 3 cols, strictly distinct pixel values -> fully asymmetric
    return np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)


def _df(spark, img):
    h, w = img.shape[:2]
    return spark.createDataFrame(
        [("img000", encode_image(img, "raw"), w, h, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )


def test_transforms_match_numpy():
    spark = get_spark()
    img = _img()
    out = {r["op"]: r for r in augmented(_df(spark, img)).collect()}
    want = {
        "fliph": img[:, ::-1],
        "flipv": img[::-1, :],
        "rot90": np.rot90(img, 1),
        "rot180": np.rot90(img, 2),
        "rot270": np.rot90(img, 3),
        "transpose": img.transpose(1, 0, 2),
    }
    assert set(out) == set(want)
    for op, w_img in want.items():
        r = out[op]
        got = decode_image(r["bytes"], r["w"], r["h"], "raw")
        assert got.shape == w_img.shape, op
        assert (got == w_img).all(), op


def test_unknown_op_rejected():
    spark = get_spark()
    with pytest.raises(ValueError, match="unknown augmentation"):
        augmented(_df(spark, _img()), ops=("fliph", "mirror"))


def test_moments_and_affine_remap_identity():
    """The oracle's algebra: transformed moments equal the affine remap of
    original moments — verified against direct numpy moments of the
    actually-transformed pixels for every op."""
    spark = get_spark()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    v = img.sum(axis=2, dtype=np.int64)
    s = int(v.sum())
    sx = int((v.sum(axis=0) * np.arange(w)).sum())
    sy = int((v.sum(axis=1) * np.arange(h)).sum())
    remap = {
        "fliph": ((w - 1) * s - sx, sy),
        "flipv": (sx, (h - 1) * s - sy),
        "rot90": (sy, (w - 1) * s - sx),
        "rot180": ((w - 1) * s - sx, (h - 1) * s - sy),
        "rot270": ((h - 1) * s - sy, sx),
        "transpose": (sy, sx),
    }
    rows = with_gray_moments(augmented(_df(spark, img))).collect()
    assert len(rows) == 6
    for r in rows:
        want_sx, want_sy = remap[r["op"]]
        assert r["s"] == s, r["op"]
        assert r["sx"] == want_sx, r["op"]
        assert r["sy"] == want_sy, r["op"]
