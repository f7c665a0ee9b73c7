"""Keypoint features: extraction determinism/margins/top-k, descriptor
bit packing ranges, pigeonhole recall of the banded match, exact-dup
self-match, and cross-codec stability."""

from __future__ import annotations

import numpy as np

from metric_search_spark.operators.features import (
    BRIEF_PAIRS,
    keypoint_match,
    with_keypoints,
)
from metric_search_spark.sources.synth import (
    decode_image,
    encode_image,
    generate_rows,
)
from tests.sparkutil import get_spark


def _kps(rows, thresh=12, max_kp=16):
    spark = get_spark()
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(rows)[["image_id", "bytes", "w", "h", "fmt"]]
    )
    return with_keypoints(df, thresh=thresh, max_kp=max_kp).collect()


def test_pattern_is_stable_and_in_patch():
    assert len(BRIEF_PAIRS) == 64
    for (ay, ax), (by, bx) in BRIEF_PAIRS:
        assert all(-4 <= v <= 4 for v in (ay, ax, by, bx))
        assert (ay, ax) != (by, bx)
    # frozen first pair — the SQL twin embeds these exact offsets
    assert BRIEF_PAIRS[0] == ((2, 0), (-2, 3))


def test_margins_topk_and_packing():
    rows = generate_rows(12, seed=42)
    got = _kps(rows)
    per = {}
    for r in got:
        per.setdefault(r.image_id, []).append(r)
    dims = {r["image_id"]: (r["w"], r["h"]) for r in rows}
    for iid, ks in per.items():
        w, h = dims[iid]
        assert len(ks) <= 16
        ranks = sorted(k.kp for k in ks)
        assert ranks == list(range(len(ks)))  # dense 0-based
        for k in ks:
            assert 4 <= k.y < h - 4 and 4 <= k.x < w - 4
            assert 0 <= k.d0 < 1 << 32 and 0 <= k.d1 < 1 << 32
        # rank order == (score desc, y, x)
        srt = sorted(ks, key=lambda k: (-k.score, k.y, k.x))
        assert [k.kp for k in srt] == list(range(len(ks)))


def test_exact_duplicate_matches_at_zero():
    rows = generate_rows(6, seed=42)
    dup = []
    for r in rows:
        dup.append(r)
        dup.append({**r, "image_id": r["image_id"] + "copy"})
    spark = get_spark()
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(dup)[["image_id", "bytes", "w", "h", "fmt"]]
    )
    kps = with_keypoints(df)
    n_per = {r.image_id: r.n for r in kps.groupBy("image_id").count()
             .withColumnRenamed("count", "n").collect()}
    m = keypoint_match(kps, max_dist=0).collect()
    pairs = {}
    for r in m:
        assert r.ham == 0
        pairs.setdefault((r.image_a, r.image_b), 0)
        pairs[(r.image_a, r.image_b)] += 1
    for r in rows:
        iid = r["image_id"]
        if n_per.get(iid, 0) == 0:
            continue
        # every keypoint of the original matches its clone in the copy
        assert pairs.get((iid, iid + "copy"), 0) >= n_per[iid]


def test_pigeonhole_recall_within_three_bits():
    # synthetic descriptors, no images: any pair within Hamming 3 of the
    # 64 bits MUST survive the 4x16-bit banding (pigeonhole)
    spark = get_spark()
    rng = np.random.default_rng(7)
    base0 = int(rng.integers(0, 1 << 32))
    base1 = int(rng.integers(0, 1 << 32))
    rows = [("A", 0, 0, 0, 0, base0, base1)]
    flips = [(0,), (5, 40), (1, 33, 63)]
    for i, bits in enumerate(flips):
        d0, d1 = base0, base1
        for b in bits:
            if b < 32:
                d0 ^= 1 << b
            else:
                d1 ^= 1 << (b - 32)
        rows.append((f"B{i}", 0, 0, 0, 0, d0, d1))
    kps = spark.createDataFrame(
        rows, "image_id string, kp long, y long, x long, score long,"
        " d0 long, d1 long"
    )
    got = {
        (r.image_a, r.image_b): r.ham
        for r in keypoint_match(kps, max_dist=3).collect()
    }
    assert got[("A", "B0")] == 1
    assert got[("A", "B1")] == 2
    assert got[("A", "B2")] == 3


def test_qnt_reencode_keeps_matches():
    rows = generate_rows(8, seed=42)
    var = []
    for r in rows:
        var.append(r)
        dec = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        var.append(
            {
                "image_id": r["image_id"] + "q",
                "bytes": encode_image(dec, "qnt"),
                "w": r["w"],
                "h": r["h"],
                "fmt": "qnt",
            }
        )
    spark = get_spark()
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(var)[["image_id", "bytes", "w", "h", "fmt"]]
    )
    kps = with_keypoints(df)
    m = keypoint_match(kps, max_dist=8)
    own = [r for r in m.collect() if r.image_b == r.image_a + "q"]
    # qnt-source originals re-encode losslessly -> at least those match
    assert len(own) > 0


def test_max_band_df_cuts_hot_buckets_only():
    import numpy as np

    spark = get_spark()
    # 5 keypoints share band 0 (d0 low half = 0); two of them also share
    # their OTHER three bands (near-identical descriptors)
    rows = [(f"i{k}", 0, 4, 4, 1, k << 16, 7) for k in range(3)]
    rows += [("j0", 0, 4, 4, 1, 5 << 16, 99), ("j1", 0, 4, 4, 1, 5 << 16, 99)]
    kps = spark.createDataFrame(
        rows, "image_id string, kp long, y long, x long, score long,"
        " d0 long, d1 long",
    )
    # without the cut: hot band 0 (df=5) pairs everything
    full = keypoint_match(kps, max_dist=64)
    assert full.count() == 10
    # cut at df<=2: band 0 dies, but j0/j1 still collide via their
    # other shared bands (d0-high=5, d1 halves), i-keypoints lose all
    cut = keypoint_match(kps, max_dist=64, max_band_df=2).collect()
    assert {(r.image_a, r.image_b) for r in cut} == {("j0", "j1")}
    assert all(r.ham == 0 for r in cut)
