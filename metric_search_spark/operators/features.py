"""Local-feature image matching: BRIEF-style binary descriptors at FAST-9
corners + a banded Hamming keypoint join.

The classic near-duplicate / re-encode / crop-detection pipeline over an
image corpus (reference analog: the image-payload use case of
n-api/test/test.js:29-63, which compares WHOLE images by SSIM — local
features are the standard scale-out of the same signal to partial matches):

1. ``with_keypoints``: per image, FAST-9 corners on integer grayscale at
   margin 4 (the descriptor patch support), scored by the comparison
   census (popcount of the bright+dark masks), top-``max_kp`` selected by
   (score DESC, y, x) — fully deterministic; each keypoint gets a 64-bit
   BRIEF census descriptor (Calonder et al. 2010): bit i is
   ``gray[p+a_i] < gray[p+b_i]`` over a fixed MINSTD-generated offset-pair
   pattern in the 9×9 patch, packed into two 32-bit halves (d0, d1) so
   every value stays a small nonnegative BIGINT in both engines.
2. ``keypoint_match``: cross-image candidate pairs via 4×16-bit descriptor
   bands (the simhash/LSH shape — an EQUI-join on (band_idx, band_val),
   never all-pairs), id-only DISTINCT before descriptors re-join (the
   candidate-dedup discipline of operators/ann.cosine_topk_lsh), then the
   exact Hamming filter ``bit_count(d0⊕d0') + bit_count(d1⊕d1') ≤
   max_dist``.

Scale shape: extraction is one mapInPandas pass (Arrow batches, all-numpy
inner loop over ≤ max_kp keypoints/image); matching shuffles only
(image_id, kp, 4 band keys) rows — |images|·max_kp·4 — and a candidate
pair survives banding with probability ~(#near-dup pairs) not ~n². At
10⁹ images this is the same banded-join plan the simhash/MinHash dedupe
tiers run.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BRIEF_PAIRS", "with_keypoints", "keypoint_match"]


def _brief_pattern(
    n: int = 64, r: int = 4, seed: int = 12345
) -> list[tuple[tuple[int, int], tuple[int, int]]]:
    """Deterministic BRIEF offset pairs ((ady, adx), (bdy, bdx)) in
    [-r, r]² from a MINSTD LCG — a module-level constant (like
    functions.image.FAST_OFFSETS) so the DuckDB twin embeds the exact
    same pattern. Degenerate a == b pairs are skipped (their bit would
    be constant 0)."""
    s = seed
    out: list[tuple[tuple[int, int], tuple[int, int]]] = []
    while len(out) < n:
        v = []
        for _ in range(4):
            s = (s * 48271) % 2147483647
            v.append(s % (2 * r + 1) - r)
        a, b = (v[0], v[1]), (v[2], v[3])
        if a != b:
            out.append((a, b))
    return out


BRIEF_PAIRS = _brief_pattern()


def with_keypoints(
    df: DataFrame, *, thresh: int = 12, max_kp: int = 16
) -> DataFrame:
    """Explodes each image row into its top-``max_kp`` FAST-9 keypoints
    with 64-bit BRIEF descriptors: (image_id, kp, y, x, score, d0, d1).

    Corner test (functions/image.with_fast_stats semantics, evaluated
    ONLY at margin-4 centers — the descriptor patch must fit): ≥9
    contiguous radius-3 Bresenham-circle pixels all > center+thresh or
    all < center−thresh on integer grayscale r+g+b. Score =
    popcount(bright mask) + popcount(dark mask); selection order
    (score DESC, y, x) with ``kp`` the 0-based rank — bit-reproducible
    by a SQL row_number twin. d0/d1 hold descriptor bits 0..31 / 32..63
    as nonnegative BIGINTs."""
    from metric_search_spark.functions.image import FAST_OFFSETS, _decode_row

    t = int(thresh)
    ady = np.array([a[0] for a, _ in BRIEF_PAIRS])
    adx = np.array([a[1] for a, _ in BRIEF_PAIRS])
    bdy = np.array([b[0] for _, b in BRIEF_PAIRS])
    bdx = np.array([b[1] for _, b in BRIEF_PAIRS])
    w_lo = 1 << np.arange(32, dtype=np.int64)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for payload, iid, w, h, fmt in zip(
                pdf["bytes"], pdf["image_id"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                w, h = int(w), int(h)
                if h < 9 or w < 9:
                    continue
                img = _decode_row(payload, w, h, str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                c = g[4 : h - 4, 4 : w - 4]
                bright = np.zeros(c.shape, dtype=np.int64)
                dark = np.zeros(c.shape, dtype=np.int64)
                for b, (dx, dy) in enumerate(FAST_OFFSETS):
                    p = g[4 + dy : h - 4 + dy, 4 + dx : w - 4 + dx]
                    bright |= (p > c + t).astype(np.int64) << b
                    dark |= (p < c - t).astype(np.int64) << b
                is_c = np.zeros(c.shape, dtype=bool)
                for mask in (bright, dark):
                    ring = mask * 65537  # mask | mask << 16
                    for r in range(16):
                        is_c |= ((ring >> r) & 511) == 511
                if not is_c.any():
                    continue
                cy, cx = np.nonzero(is_c)
                score = np.zeros(len(cy), dtype=np.int64)
                for mask in (bright[cy, cx], dark[cy, cx]):
                    mm = mask.copy()
                    for _ in range(16):
                        score += mm & 1
                        mm >>= 1
                ys, xs = cy + 4, cx + 4  # absolute coords
                order = np.lexsort((xs, ys, -score))[:max_kp]
                ys, xs, score = ys[order], xs[order], score[order]
                bits = (
                    g[ys[:, None] + ady[None, :], xs[:, None] + adx[None, :]]
                    < g[ys[:, None] + bdy[None, :], xs[:, None] + bdx[None, :]]
                ).astype(np.int64)
                d0 = (bits[:, :32] * w_lo).sum(axis=1)
                d1 = (bits[:, 32:] * w_lo).sum(axis=1)
                for j in range(len(ys)):
                    rows.append(
                        (iid, j, int(ys[j]), int(xs[j]), int(score[j]),
                         int(d0[j]), int(d1[j]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "kp", "y", "x", "score", "d0", "d1"],
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen,
        schema=(
            "image_id string, kp long, y long, x long, score long,"
            " d0 long, d1 long"
        ),
    )


def keypoint_match(
    kps: DataFrame, *, max_dist: int = 8, max_band_df: int | None = None
) -> DataFrame:
    """Cross-image keypoint matches within ``max_dist`` Hamming bits of
    the 64-bit descriptor: (image_a, kp_a, image_b, kp_b, ham), with
    image_a < image_b.

    Plan: 4×16-bit descriptor bands → (band_idx, band_val) equi-join —
    a pair is a candidate iff it collides in ≥1 band (Hamming ≤ 3 pairs
    ALWAYS collide by pigeonhole: 4 bands, ≤3 differing bits — and at
    max_dist ≤ 3 recall is exact; above that, banded recall like every
    LSH tier, disclosed). Candidates DISTINCT on ids only, descriptors
    re-join after, exact popcount filter last. No all-pairs product
    anywhere.

    ``max_band_df``: at corpus scale a DEGENERATE band value (e.g. the
    all-zeros band every smooth patch produces) turns one band bucket
    into a quadratic candidate blob — the hot-shingle problem of the
    MinHash tier, and the same fix: drop (band_idx, band_val) buckets
    whose keypoint frequency exceeds the cut BEFORE the self-join.
    Lossy by design (a pair colliding ONLY in a hot band is missed —
    near-identical keypoints still collide in their other 3 bands);
    None (default) keeps everything."""
    d = kps.select("image_id", "kp", "d0", "d1")
    bands = d.select(
        "image_id",
        "kp",
        F.posexplode(
            F.array(
                F.col("d0") % 65536,
                F.expr("d0 div 65536"),
                F.col("d1") % 65536,
                F.expr("d1 div 65536"),
            )
        ).alias("bi", "bv"),
    )
    if max_band_df is not None:
        keep = (
            bands.groupBy("bi", "bv")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_band_df)
            .select("bi", "bv")
        )
        bands = bands.join(keep, ["bi", "bv"])
    a = bands.select(
        F.col("image_id").alias("image_a"), F.col("kp").alias("kp_a"),
        "bi", "bv",
    )
    b = bands.select(
        F.col("image_id").alias("image_b"), F.col("kp").alias("kp_b"),
        "bi", "bv",
    )
    cand = (
        a.join(b, ["bi", "bv"])
        .where(F.col("image_a") < F.col("image_b"))
        .select("image_a", "kp_a", "image_b", "kp_b")
        .distinct()
    )
    da = d.select(
        F.col("image_id").alias("image_a"), F.col("kp").alias("kp_a"),
        F.col("d0").alias("_d0a"), F.col("d1").alias("_d1a"),
    )
    db = d.select(
        F.col("image_id").alias("image_b"), F.col("kp").alias("kp_b"),
        F.col("d0").alias("_d0b"), F.col("d1").alias("_d1b"),
    )
    ham = (
        F.bit_count(F.expr("_d0a ^ _d0b")) + F.bit_count(F.expr("_d1a ^ _d1b"))
    ).cast("long")
    return (
        cand.join(da, ["image_a", "kp_a"])
        .join(db, ["image_b", "kp_b"])
        .withColumn("ham", ham)
        .where(F.col("ham") <= max_dist)
        .select("image_a", "kp_a", "image_b", "kp_b", "ham")
    )
