"""Image payload plumbing: decode / stats / perceptual hash / resize /
verification over the (bytes, w, h, fmt) columns of the image table
(BASELINE.json input_hint schema).

All heavy work runs in ``mapInPandas`` over Arrow batches — numpy-vectorized
per batch, never per-row Python UDFs. Codecs are the numpy-native ones from
sources/synth.py ('raw' lossless, 'qnt' 6-bit lossy); exotic formats (jpeg,
webp, mp4 frames, audio) are STUBBED behind ``decode_external`` with a
NotImplementedError — the container has no PIL/ffmpeg — but the Spark-side
plumbing (schema, batching, partitioning) is identical for a real codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame

from metric_search_spark.sources.synth import decode_image, phash64, psnr

__all__ = [
    "decode_external",
    "with_image_stats",
    "with_channel_sums",
    "with_phash64",
    "resized",
    "verify_payloads",
]

_SUPPORTED = {"raw", "qnt"}


def decode_external(payload: bytes, fmt: str) -> np.ndarray:
    """Stub for container-absent codecs (jpeg/png/webp/...). The engine's
    schema and batch shape are codec-agnostic; plugging a real decoder in
    replaces this one function."""
    raise NotImplementedError(
        f"codec {fmt!r} needs an external library not present in this "
        "environment; supported here: raw, qnt"
    )


def _decode_row(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in _SUPPORTED:
        return decode_image(payload, w, h, fmt)
    return decode_external(payload, fmt)


def with_image_stats(df: DataFrame) -> DataFrame:
    """Adds per-channel means + stddevs decoded from the payload
    (mean_r/g/b, std_r/g/b). Arrow-batched mapInPandas."""
    schema = df.schema.simpleString()[7:-1] + (
        ", mean_r double, mean_g double, mean_b double,"
        " std_r double, std_g double, std_b double"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            stats = np.empty((len(pdf), 6))
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt)).astype(
                    np.float64
                )
                stats[i, :3] = img.mean(axis=(0, 1))
                stats[i, 3:] = img.std(axis=(0, 1))
            for j, name in enumerate(
                ("mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b")
            ):
                pdf[name] = stats[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def with_channel_sums(df: DataFrame) -> DataFrame:
    """Adds EXACT per-channel int64 pixel sums (sum_r/g/b) and the pixel
    count (npx = w·h) decoded from the payload. Unlike with_image_stats'
    float means, integer sums merge associatively under any partitioning —
    the building block for deterministic downstream aggregates (tile
    mosaics, corpus-level channel statistics) whose final division happens
    once, on identical exact integers, in every engine."""
    schema = df.schema.simpleString()[7:-1] + (
        ", sum_r long, sum_g long, sum_b long, npx long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.empty((len(pdf), 4), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                out[i, :3] = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out[i, 3] = int(w) * int(h)
            for j, name in enumerate(("sum_r", "sum_g", "sum_b", "npx")):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def with_phash64(df: DataFrame, out_col: str = "phash64") -> DataFrame:
    """Adds the classic 8×8 mean-threshold perceptual hash of the decoded
    pixels (the reference's image use-case via SSIM distance —
    n-api/test/test.js:29-63 — uses whole images; phash64 is the standard
    near-dup compaction of the same signal)."""
    schema = df.schema.simpleString()[7:-1] + f", {out_col} long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                out[i] = phash64(_decode_row(payload, int(w), int(h), str(fmt)))
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def resized(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every payload to (out_w, out_h); output
    keeps the input schema with bytes/w/h/fmt rewritten (fmt → 'raw').
    Numpy index-grid resize — vectorized per image, batched per Arrow chunk."""
    schema = df.schema.simpleString()[7:-1]

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            new_bytes = []
            for payload, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                new_bytes.append(img[yi][:, xi].astype(np.uint8).tobytes())
            pdf["bytes"] = new_bytes
            pdf["w"] = np.int32(out_w)
            pdf["h"] = np.int32(out_h)
            pdf["fmt"] = "raw"
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def verify_payloads(df: DataFrame, seed: int = 42) -> DataFrame:
    """The per-row payload invariant from BASELINE.json input_hint: decoded
    pixels must reproduce the stored phash, and for the lossy 'qnt' codec the
    decode must reach PSNR ≥ 40 dB **against the true original**, which is
    re-rendered from the deterministic generator (image_id encodes the row
    seed — sources/synth.py). Returns (image_id, fmt, phash_ok, psnr_db)."""
    from metric_search_spark.sources.synth import (
        decode_image as _dec,
        encode_image,
        phash_from_image,
        render_original,
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            oks, psnrs = [], []
            for image_id, payload, w, h, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                oks.append(phash_from_image(img) == int(ph))
                if str(fmt) == "qnt":
                    original = render_original(image_id, int(w), int(h), seed=seed)
                    psnrs.append(psnr(original, img))
                else:
                    # lossless: decode(encode(decode)) must be identical
                    rt = _dec(encode_image(img, "raw"), int(w), int(h), "raw")
                    psnrs.append(psnr(img, rt))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "fmt": pdf["fmt"],
                    "phash_ok": oks,
                    "psnr_db": psnrs,
                }
            )

    return df.mapInPandas(
        gen, schema="image_id string, fmt string, phash_ok boolean, psnr_db double"
    )


__all__.append("with_sobel_stats")


def with_sobel_stats(df: DataFrame) -> DataFrame:
    """Sobel edge-magnitude statistics per image — the standard
    edge-density feature a visual-quality / blur / content classifier
    reads: gradient magnitudes over the decoded payload, reduced to
    (edge_sum, edge_max, n_int).

    EXACT by construction: grayscale is the INTEGER channel sum r+g+b
    (0..765), both 3×3 Sobel responses are integer linear combinations of
    it, and the magnitude is the L1 norm |gx|+|gy| (no sqrt) — so every
    statistic is an int64 and a twin recomputing from raw pixels matches
    bit-for-bit. Responses cover the (h−2)×(w−2) interior (no padding
    convention to disagree over); n_int records it. Arrow-batched
    mapInPandas; the convolution is pure numpy slice arithmetic per image,
    never per-pixel Python."""
    schema = df.schema.simpleString()[7:-1] + (
        ", edge_sum long, edge_max long, n_int long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 3), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                if g.shape[0] < 3 or g.shape[1] < 3:
                    continue
                gx = (
                    g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:]
                    - g[:-2, :-2] - 2 * g[1:-1, :-2] - g[2:, :-2]
                )
                gy = (
                    g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                    - g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:]
                )
                mag = np.abs(gx) + np.abs(gy)
                out[i] = (mag.sum(), mag.max(), mag.size)
            for j, name in enumerate(("edge_sum", "edge_max", "n_int")):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_channel_hist")


def with_channel_hist(df: DataFrame, bins: int = 8) -> DataFrame:
    """Per-image per-channel intensity histogram — the exposure /
    color-cast / contrast feature a curation pipeline bins on (and the
    input to histogram-equalization stats): counts of each channel's
    pixels per equal-width bin (bin = v·bins/256, exact integer division).
    Emits SPARSE rows (image_id, channel, bin, cnt) — empty bins are
    absent, all counts exact int64, so a twin recounting raw pixels
    matches bit-for-bit. Arrow-batched mapInPandas; per image the count
    is one numpy bincount per channel, never per-pixel Python."""
    import pandas as pd

    if 256 % bins:
        raise ValueError(f"bins {bins} must divide 256")
    div = 256 // bins
    schema = "image_id string, channel int, bin int, cnt long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids: list[str] = []
            chs: list[int] = []
            bns: list[int] = []
            cts: list[int] = []
            for payload, w, h, fmt, iid in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["image_id"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                for c in range(3):
                    bc = np.bincount(
                        img[:, :, c].ravel() // div, minlength=bins
                    )
                    nz = np.nonzero(bc)[0]
                    ids.extend([iid] * len(nz))
                    chs.extend([c] * len(nz))
                    bns.extend(int(b) for b in nz)
                    cts.extend(int(bc[b]) for b in nz)
            yield pd.DataFrame(
                {"image_id": ids, "channel": chs, "bin": bns, "cnt": cts}
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=schema
    )

__all__.append("with_glcm_stats")


def with_glcm_stats(df: DataFrame, levels: int = 8) -> DataFrame:
    """Gray-level co-occurrence (GLCM, Haralick et al. 1973) texture
    statistics per image — the classic texture/flatness feature a visual
    curation pipeline reads next to edge density: quantize the integer
    grayscale (channel sum, 0..765) into ``levels`` bins by exact integer
    division, count DIRECTED horizontal neighbor pairs (x, x+1), and
    reduce the co-occurrence matrix to
      contrast   = Σ c(a,b)·(a−b)²                    (high = busy texture)
      energy_num = Σ c(a,b)²                          (high = uniform)
      homog_840  = Σ c(a,b)·(840 // (1+|a−b|))        (840 = lcm(1..8), so
                   the inverse-difference weights are EXACT integers for
                   levels ≤ 8)
      n_pairs    = h·(w−1)
    Every statistic is an exact int64 — a twin recounting pairs from raw
    pixels matches bit-for-bit. Arrow-batched mapInPandas; per image the
    count is ONE bincount over a*levels+b, never per-pixel Python."""
    if 768 % levels or levels > 8:
        raise ValueError(f"levels {levels} must divide 768 and be <= 8")
    div = 768 // levels
    schema = df.schema.simpleString()[7:-1] + (
        ", contrast long, energy_num long, homog_840 long, n_pairs long"
    )
    lv = np.arange(levels * levels, dtype=np.int64)
    da, db = lv // levels, lv % levels
    w_contrast = (da - db) ** 2
    w_homog = 840 // (1 + np.abs(da - db))

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 4), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                q = img.astype(np.int64).sum(axis=2) // div
                if q.shape[1] < 2:
                    continue
                idx = q[:, :-1].ravel() * levels + q[:, 1:].ravel()
                bc = np.bincount(idx, minlength=levels * levels)
                out[i] = (
                    int((bc * w_contrast).sum()),
                    int((bc * bc).sum()),
                    int((bc * w_homog).sum()),
                    int(bc.sum()),
                )
            for j, name in enumerate(
                ("contrast", "energy_num", "homog_840", "n_pairs")
            ):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)

__all__.append("with_pyramid_sums")


def with_pyramid_sums(df: DataFrame, levels: int = 3) -> DataFrame:
    """Overview pyramid per image — the raster analogue of the tile-rollup
    pyramid (and what COG/GeoTIFF overviews are): level L+1 halves level L
    by the EXACT 2×2 integer box filter p' = (p00+p01+p10+p11) // 4,
    cropping odd edges (the standard truncation convention). Iterative
    flooring is the DEFINED semantic (⌊⌊·⌋/4⌋ ≠ ⌊·/4^L⌋ — a twin must
    replay the recurrence, not shortcut it). Emits one row per (image,
    level) with the level's dims and exact int64 per-channel sums —
    the thumbnail/AB-test signal a curation pipeline reads without ever
    shipping pixels. Levels stop early when a dimension would hit zero.
    Arrow-batched mapInPandas; per level ONE numpy slice-sum per image."""
    import pandas as pd

    schema = (
        "image_id string, level int, w int, h int, "
        "sum_r long, sum_g long, sum_b long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids: list[str] = []
            lvls: list[int] = []
            ws: list[int] = []
            hs: list[int] = []
            s0: list[int] = []
            s1: list[int] = []
            s2: list[int] = []
            for payload, w, h, fmt, iid in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["image_id"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt)).astype(
                    np.int64
                )
                for lvl in range(levels + 1):
                    hh, ww = img.shape[:2]
                    ids.append(iid)
                    lvls.append(lvl)
                    ws.append(ww)
                    hs.append(hh)
                    sums = img.sum(axis=(0, 1))
                    s0.append(int(sums[0]))
                    s1.append(int(sums[1]))
                    s2.append(int(sums[2]))
                    if lvl == levels or hh < 2 or ww < 2:
                        break
                    img = (
                        img[0 : hh - hh % 2 : 2, 0 : ww - ww % 2 : 2]
                        + img[1 : hh - hh % 2 : 2, 0 : ww - ww % 2 : 2]
                        + img[0 : hh - hh % 2 : 2, 1 : ww - ww % 2 : 2]
                        + img[1 : hh - hh % 2 : 2, 1 : ww - ww % 2 : 2]
                    ) // 4
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "level": lvls,
                    "w": ws,
                    "h": hs,
                    "sum_r": s0,
                    "sum_g": s1,
                    "sum_b": s2,
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=schema
    )

__all__.append("with_otsu_threshold")


def with_otsu_threshold(df: DataFrame) -> DataFrame:
    """Otsu adaptive binarization threshold per image (Otsu 1979) — the
    foreground/background split a document-scan or mask-generation
    pipeline derives per image: over the mean-grayscale histogram
    (g = (r+g+b)//3 ∈ 0..255), pick the threshold t (pixels < t are
    "background") maximizing the between-class separation.

    EXACT integer objective: with N pixels, total gray sum S, and
    cumulative (w_t, s_t) below t, the between-class variance orders like
    (s_t·N − S·w_t)² / (w_t·(N−w_t)); this operator DEFINES the score as
    the floored integer quotient of exactly that fraction (numerator
    ≤ (255·N)² < 2⁶³ for N ≤ 3·10⁵ pixels, so everything is int64), and
    the argmax breaks ties to the smallest t — bit-reproducible in any
    engine, no float anywhere. Images with constant grayscale have no
    valid split and are dropped. One bincount + cumsum per image,
    Arrow-batched. Returns (image_id, t_star, score_star, w_b, n_px)."""
    import pandas as pd

    schema = "image_id string, t_star long, score_star long, w_b long, n_px long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids: list[str] = []
            ts: list[int] = []
            sc: list[int] = []
            wb: list[int] = []
            npx: list[int] = []
            for payload, w, h, fmt, iid in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["image_id"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2).ravel() // 3
                n = g.size
                hist = np.bincount(g, minlength=256)
                cc = np.cumsum(hist)[:255]          # w_t for t = 1..255
                cs = np.cumsum(hist * np.arange(256))[:255]
                s = int(cs[-1] + (hist[255] * 255))
                valid = (cc > 0) & (cc < n)
                if not valid.any():
                    continue
                if n <= 3400:
                    num = cs * n - s * cc
                    den = cc * (n - cc)
                    score = np.where(
                        valid, num * num // np.where(den > 0, den, 1), -1
                    )
                else:  # exact int128-equivalent path, 255 ops per image
                    score = np.array(
                        [
                            (int(cs[t]) * n - s * int(cc[t])) ** 2
                            // (int(cc[t]) * (n - int(cc[t])))
                            if valid[t]
                            else -1
                            for t in range(255)
                        ],
                        dtype=object,
                    )
                i = int(np.argmax(score))           # first max = smallest t
                ids.append(iid)
                ts.append(i + 1)
                sc.append(int(score[i]))
                wb.append(int(cc[i]))
                npx.append(int(n))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "t_star": ts,
                    "score_star": sc,
                    "w_b": wb,
                    "n_px": npx,
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=schema
    )

__all__.append("with_patch_sums")


def with_patch_sums(df: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patchify: cut each image into non-overlapping
    ``patch``×``patch`` tiles (row-major grid, odd edges cropped — the
    standard ViT convention) and emit one row per patch with its grid
    coordinates and exact int64 per-channel sums — the "image tokenizer"
    a multimodal training pipeline runs before embedding; the sums are
    the exact linear-patch-projection input statistic. Images smaller
    than one patch emit nothing. Arrow-batched mapInPandas; per image the
    reduction is ONE reshape+sum, never per-pixel Python. Returns
    (image_id, py, px, sum_r, sum_g, sum_b)."""
    import pandas as pd

    if patch < 1:
        raise ValueError(f"patch {patch} must be >= 1")
    schema = (
        "image_id string, py int, px int, sum_r long, sum_g long, sum_b long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids: list[str] = []
            pys: list[int] = []
            pxs: list[int] = []
            s0: list[int] = []
            s1: list[int] = []
            s2: list[int] = []
            for payload, w, h, fmt, iid in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["image_id"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                gh, gw = int(h) // patch, int(w) // patch
                if gh == 0 or gw == 0:
                    continue
                crop = img[: gh * patch, : gw * patch].astype(np.int64)
                # (gh, patch, gw, patch, 3) -> per-patch channel sums
                sums = crop.reshape(gh, patch, gw, patch, 3).sum(axis=(1, 3))
                n = gh * gw
                ids.extend([iid] * n)
                yy, xx = np.meshgrid(
                    np.arange(gh), np.arange(gw), indexing="ij"
                )
                pys.extend(yy.ravel().tolist())
                pxs.extend(xx.ravel().tolist())
                s0.extend(sums[:, :, 0].ravel().tolist())
                s1.extend(sums[:, :, 1].ravel().tolist())
                s2.extend(sums[:, :, 2].ravel().tolist())
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "py": pys,
                    "px": pxs,
                    "sum_r": s0,
                    "sum_g": s1,
                    "sum_b": s2,
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=schema
    )


__all__.append("augmented")

_AUG_OPS = ("fliph", "flipv", "rot90", "rot180", "rot270", "transpose")


def augmented(df: DataFrame, ops: tuple[str, ...] = _AUG_OPS) -> DataFrame:
    """Exact geometric augmentation — the training-pipeline staple: decode
    each payload, apply lossless pixel permutations (horizontal/vertical
    flip, 90°/180°/270° rotation, transpose — the dihedral-group ops data
    augmentation uses), and RE-ENCODE to the lossless 'raw' codec, so the
    output rows are first-class image rows every downstream operator
    (phash, sobel, mosaic, …) consumes unchanged. Emits one row per
    (image, op): (image_id, op, bytes, w, h, fmt) with dims swapped for the
    odd rotations/transpose. One mapInPandas decode→permute→encode pass."""
    import pandas as pd

    from metric_search_spark.sources.synth import encode_image

    bad = set(ops) - set(_AUG_OPS)
    if bad:
        raise ValueError(f"unknown augmentation ops {sorted(bad)}; known: {_AUG_OPS}")

    def transform(img: np.ndarray, op: str) -> np.ndarray:
        if op == "fliph":
            return img[:, ::-1]
        if op == "flipv":
            return img[::-1, :]
        if op == "rot90":
            return np.rot90(img, 1)
        if op == "rot180":
            return np.rot90(img, 2)
        if op == "rot270":
            return np.rot90(img, 3)
        return img.transpose(1, 0, 2)  # transpose

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, opsc, bts, ws, hs = [], [], [], [], []
            for payload, w, h, fmt, iid in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["image_id"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                for op in ops:
                    t = np.ascontiguousarray(transform(img, op))
                    th, tw = t.shape[:2]
                    ids.append(iid)
                    opsc.append(op)
                    bts.append(encode_image(t, "raw"))
                    ws.append(tw)
                    hs.append(th)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "op": opsc,
                    "bytes": bts,
                    "w": np.asarray(ws, dtype=np.int32),
                    "h": np.asarray(hs, dtype=np.int32),
                    "fmt": ["raw"] * len(ids),
                }
            )

    return df.mapInPandas(
        gen,
        schema="image_id string, op string, bytes binary, w int, h int, fmt string",
    )


__all__.append("with_gray_moments")


def with_gray_moments(df: DataFrame) -> DataFrame:
    """EXACT integer grayscale raw moments per image: v(x, y) = r+g+b,
    s = Σv, sx = Σ col·v, sy = Σ row·v — fully geometry-sensitive (any
    wrong flip/rotation moves sx/sy) and pure int64, so cross-engine
    comparison needs no epsilon. One decode pass, numpy outer products."""
    schema = df.schema.simpleString()[7:-1] + ", s long, sx long, sy long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.empty((len(pdf), 3), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                v = img.sum(axis=2, dtype=np.int64)  # (h, w)
                out[i, 0] = v.sum()
                out[i, 1] = (v.sum(axis=0) * np.arange(int(w), dtype=np.int64)).sum()
                out[i, 2] = (v.sum(axis=1) * np.arange(int(h), dtype=np.int64)).sum()
            pdf["s"] = out[:, 0]
            pdf["sx"] = out[:, 1]
            pdf["sy"] = out[:, 2]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_morphology_stats")


def with_morphology_stats(df: DataFrame, thresh: int = 384) -> DataFrame:
    """3×3 morphology + median filter per image, in exact int64 — the
    mask-cleanup primitives (erode speckle, dilate gaps, median denoise)
    a segmentation/OCR-adjacent curation stage runs before measuring
    foreground. Binary mask = integer grayscale (r+g+b, 0..765) ≥ thresh;
    over the (h−2)×(w−2) interior: eroded = all 9 neighbors masked,
    dilated = any masked, median = the 5th-smallest of the 9 gray values
    (9 is odd → an exact integer, no interpolation convention). Outputs
    (mask_cnt over the FULL image, eroded_cnt, dilated_cnt, med_sum,
    n_int) — every one recomputable bit-for-bit by a twin reading raw
    pixels. Arrow-batched mapInPandas; per image the 9 neighborhoods are
    stacked numpy slices (one sort along the stack axis for the median),
    never per-pixel Python."""
    schema = df.schema.simpleString()[7:-1] + (
        ", mask_cnt long, eroded_cnt long, dilated_cnt long,"
        " med_sum long, n_int long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 5), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                m = g >= thresh
                out[i, 0] = int(m.sum())
                if g.shape[0] < 3 or g.shape[1] < 3:
                    continue
                win = [
                    g[dy : dy + g.shape[0] - 2, dx : dx + g.shape[1] - 2]
                    for dy in range(3)
                    for dx in range(3)
                ]
                stack = np.stack(win)  # (9, h-2, w-2)
                mwin = stack >= thresh
                out[i, 1] = int(mwin.all(axis=0).sum())
                out[i, 2] = int(mwin.any(axis=0).sum())
                med = np.sort(stack, axis=0)[4]
                out[i, 3] = int(med.sum())
                out[i, 4] = med.size
            for j, name in enumerate(
                ("mask_cnt", "eroded_cnt", "dilated_cnt", "med_sum", "n_int")
            ):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_equalized_hist")


def with_equalized_hist(df: DataFrame) -> DataFrame:
    """Histogram equalization per image, reported as the SPARSE histogram
    of equalized levels — the contrast-normalization step an exposure-
    diverse image corpus gets before feature extraction. Exact-integer
    formulation of the textbook transfer (Gonzalez & Woods): over integer
    grayscale v = r+g+b (766 levels), eq(v) = ⌊(cdf(v) − cdf_min) · 255 /
    (n − cdf_min)⌋ with cdf_min the cdf at the lowest occupied level; a
    constant image (n == cdf_min) maps to level 0. Emits (image_id,
    eq_level, cnt) — empty levels absent, counts exact int64, so a twin
    replaying cdf → transfer → recount from raw pixels matches
    bit-for-bit. One bincount + cumsum per image, never per-pixel
    Python."""
    import pandas as pd

    schema = "image_id string, eq_level int, cnt long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids: list[str] = []
            lvl: list[int] = []
            cts: list[int] = []
            for payload, w, h, fmt, iid in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["image_id"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                hist = np.bincount(g.ravel(), minlength=766)
                cdf = np.cumsum(hist)
                n = int(cdf[-1])
                occ = np.nonzero(hist)[0]
                cdf_min = int(cdf[occ[0]])
                if n == cdf_min:
                    eq = np.zeros(len(occ), dtype=np.int64)
                else:
                    eq = (cdf[occ] - cdf_min) * 255 // (n - cdf_min)
                agg = np.zeros(256, dtype=np.int64)
                np.add.at(agg, eq, hist[occ])
                nz = np.nonzero(agg)[0]
                ids.extend([iid] * len(nz))
                lvl.extend(int(b) for b in nz)
                cts.extend(int(agg[b]) for b in nz)
            yield pd.DataFrame({"image_id": ids, "eq_level": lvl, "cnt": cts})

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema=schema
    )


__all__.append("with_harris_stats")


def with_harris_stats(df: DataFrame) -> DataFrame:
    """Harris corner-response statistics per image — the
    cornerness/texture-richness feature a keypoint or image-quality stage
    reads (Harris & Stephens 1988): structure tensor M = 3×3 box sum of
    [Ix², IxIy; IxIy, Iy²] over integer Sobel gradients, response
    R = det(M) − k·tr(M)² at the standard k = 1/16, scaled by 16 so
    R16 = 16·(SxxSyy − Sxy²) − (Sxx+Syy)² is an EXACT int64 (gray ≤ 765
    → |I| ≤ 3060 → S ≤ 8.5e7 → |R16| < 1.5e17). Reduced per image to
    (n_corners = #{R16 > 0}, resp_max = max R16, n_int) over the
    (h−4)×(w−4) region with full 5×5 support — no padding convention to
    disagree over; R16 > 0 is the corner-vs-edge sign test. A twin
    recomputing from raw pixels matches bit-for-bit. Arrow-batched
    mapInPandas; pure numpy slice arithmetic per image."""
    schema = df.schema.simpleString()[7:-1] + (
        ", n_corners long, resp_max long, n_int long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 3), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                if g.shape[0] < 5 or g.shape[1] < 5:
                    continue
                gx = (
                    g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:]
                    - g[:-2, :-2] - 2 * g[1:-1, :-2] - g[2:, :-2]
                )
                gy = (
                    g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                    - g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:]
                )

                def box3(a: np.ndarray) -> np.ndarray:
                    return (
                        a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
                        + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
                        + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
                    )

                sxx = box3(gx * gx)
                syy = box3(gy * gy)
                sxy = box3(gx * gy)
                r16 = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
                out[i] = ((r16 > 0).sum(), r16.max(), r16.size)
            for j, name in enumerate(("n_corners", "resp_max", "n_int")):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_blob_stats")


def with_blob_stats(df: DataFrame, thresh: int = 600) -> DataFrame:
    """Per-image connected-component (blob) statistics — the object-count
    / largest-object feature a curation or labeling-QA stage reads:
    foreground = integer grayscale (r+g+b) ≥ thresh, 4-connected
    components over the foreground mask, reduced to exact int64
    (n_blobs, max_blob, fg_px). The cross-IMAGE analog on the tile
    lattice is operators/tiling.label_regions; this one labels pixels
    INSIDE each decoded payload. At the default thresh the synthetic
    foreground is <1% of pixels, so the per-image BFS touches only
    foreground pixels; an image with no foreground reports (0, 0, 0).
    Arrow-batched mapInPandas; a twin recomputing components from raw
    pixels (recursive-CTE reachability) matches exactly."""
    from collections import deque

    schema = df.schema.simpleString()[7:-1] + (
        ", n_blobs long, max_blob long, fg_px long"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 3), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                fg = img.astype(np.int64).sum(axis=2) >= thresh
                hh, ww = fg.shape
                seen = np.zeros_like(fg, dtype=bool)
                n_blobs = 0
                max_blob = 0
                for yx in zip(*np.nonzero(fg)):
                    if seen[yx]:
                        continue
                    q = deque([yx])
                    seen[yx] = True
                    sz = 0
                    while q:
                        cy, cx = q.popleft()
                        sz += 1
                        for ny, nx in (
                            (cy + 1, cx), (cy - 1, cx),
                            (cy, cx + 1), (cy, cx - 1),
                        ):
                            if (
                                0 <= ny < hh and 0 <= nx < ww
                                and fg[ny, nx] and not seen[ny, nx]
                            ):
                                seen[ny, nx] = True
                                q.append((ny, nx))
                    n_blobs += 1
                    max_blob = max(max_blob, sz)
                out[i] = (n_blobs, max_blob, int(fg.sum()))
            for j, name in enumerate(("n_blobs", "max_blob", "fg_px")):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_orient_hist")


def with_orient_hist(df: DataFrame) -> DataFrame:
    """Per-image gradient-orientation histogram (the HOG cell descriptor,
    Dalal & Triggs 2005) in EXACT integers: integer Sobel gradients over
    the (h−2)×(w−2) interior, 8 orientation octants decided purely by
    integer comparisons —

        bin = 2·quadrant(gx≥0, gy≥0 → 0; gx<0, gy≥0 → 1; gx<0, gy<0 → 2;
              gx≥0, gy<0 → 3) + (|gy| > |gx|)

    (every boundary tie is pinned by ≥/>; the zero gradient lands in bin
    0 with weight 0) — weighted by the L1 magnitude |gx|+|gy|, so every
    histogram mass is an int64 a raw-pixels twin reproduces bit-for-bit.
    Returns one row per (image, bin) with at least one interior pixel:
    (image_id…, bin, n_px, wsum)."""
    base = df.schema.simpleString()[7:-1]
    schema = base + ", bin long, n_px long, wsum long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            reps: list[int] = []
            bins: list[np.ndarray] = []
            for payload, w, h, fmt in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                if g.shape[0] < 3 or g.shape[1] < 3:
                    reps.append(0)
                    bins.append(np.empty((0, 3), dtype=np.int64))
                    continue
                gx = (
                    g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:]
                    - g[:-2, :-2] - 2 * g[1:-1, :-2] - g[2:, :-2]
                ).ravel()
                gy = (
                    g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                    - g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:]
                ).ravel()
                quad = np.where(
                    gy >= 0, np.where(gx >= 0, 0, 1), np.where(gx < 0, 2, 3)
                )
                b = 2 * quad + (np.abs(gy) > np.abs(gx))
                wgt = np.abs(gx) + np.abs(gy)
                n_px = np.bincount(b, minlength=8)
                wsum = np.bincount(b, weights=wgt, minlength=8).astype(
                    np.int64
                )
                keep = np.nonzero(n_px)[0]
                reps.append(len(keep))
                bins.append(
                    np.stack(
                        [keep, n_px[keep], wsum[keep]], axis=1
                    ).astype(np.int64)
                )
            idx = np.repeat(np.arange(len(pdf)), reps)
            flat = (
                np.concatenate(bins, axis=0)
                if bins
                else np.empty((0, 3), dtype=np.int64)
            )
            out = pdf.iloc[idx].reset_index(drop=True)
            out["bin"] = flat[:, 0]
            out["n_px"] = flat[:, 1]
            out["wsum"] = flat[:, 2]
            yield out

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_lbp_hist")

# Ojala neighbor order: clockwise from top-left, weights 2^0 .. 2^7
_LBP_OFF = (
    (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1),
)


def with_lbp_hist(df: DataFrame) -> DataFrame:
    """Per-image local-binary-pattern histogram (Ojala et al. 2002) — the
    classic texture descriptor a near-dup / material / quality classifier
    reads: at every interior pixel the 8-bit pattern
    Σⱼ 2ʲ·[gray(neighborⱼ) ≥ gray(center)] over the fixed clockwise
    neighbor order, histogrammed per image. Pure integer comparisons on
    the r+g+b grayscale — every count is exact, and a raw-pixels twin
    evaluating the same 8 CASE predicates matches bit-for-bit. Returns
    one row per (image, pattern) with cnt ≥ 1: (image_id…, pattern,
    cnt)."""
    base = df.schema.simpleString()[7:-1]
    schema = base + ", pattern long, cnt long"

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            reps: list[int] = []
            outs: list[np.ndarray] = []
            for payload, w, h, fmt in zip(
                pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                hh, ww = g.shape
                if hh < 3 or ww < 3:
                    reps.append(0)
                    outs.append(np.empty((0, 2), dtype=np.int64))
                    continue
                c = g[1:-1, 1:-1]
                pat = np.zeros_like(c)
                for j, (dy, dx) in enumerate(_LBP_OFF):
                    nb = g[1 + dy : hh - 1 + dy, 1 + dx : ww - 1 + dx]
                    pat += (nb >= c).astype(np.int64) << j
                cnt = np.bincount(pat.ravel(), minlength=256)
                keep = np.nonzero(cnt)[0]
                reps.append(len(keep))
                outs.append(
                    np.stack([keep, cnt[keep]], axis=1).astype(np.int64)
                )
            idx = np.repeat(np.arange(len(pdf)), reps)
            flat = (
                np.concatenate(outs, axis=0)
                if outs
                else np.empty((0, 2), dtype=np.int64)
            )
            out = pdf.iloc[idx].reset_index(drop=True)
            out["pattern"] = flat[:, 0]
            out["cnt"] = flat[:, 1]
            yield out

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_fast_stats")

# radius-3 Bresenham circle, the published FAST-9 pixel order (Rosten &
# Drummond 2006, fig. 1) — (dx, dy) clockwise from 12 o'clock. Any cyclic
# relabeling preserves contiguous runs; the oracle reuses this exact list.
FAST_OFFSETS = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]


def with_fast_stats(df: DataFrame, thresh: int = 90) -> DataFrame:
    """FAST-9 corner detection (Rosten & Drummond 2006) per image, exact
    int64: a full-support pixel is a corner iff ≥ 9 CONTIGUOUS pixels of
    its radius-3 Bresenham circle are all brighter than center+thresh or
    all darker than center−thresh, on the integer grayscale r+g+b
    (0..765). Reduces to
      (n_fast, arc_bits, n_int):
    corner count, Σ popcount(bright mask)+popcount(dark mask) over all
    centers (the per-offset comparison census — sensitive to any single
    wrong comparison, where the count alone might not move), and the
    (h−6)·(w−6) full-support center count.

    The circular-run test is branch-free integer math: with the 16
    comparison bits packed into m, m·65537 doubles the ring (m | m<<16)
    and a run of ≥ 9 exists iff some 16-rotation has its low 9 bits all
    set — the same closed form the DuckDB twin evaluates per pixel, while
    the kernel evaluates it vectorized across every center at once."""
    schema = df.schema.simpleString()[7:-1] + (
        ", n_fast long, arc_bits long, n_int long"
    )
    t = int(thresh)

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 3), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                img = _decode_row(payload, int(w), int(h), str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                hh, ww = g.shape
                if hh < 7 or ww < 7:
                    continue
                c = g[3 : hh - 3, 3 : ww - 3]
                bright = np.zeros(c.shape, dtype=np.int64)
                dark = np.zeros(c.shape, dtype=np.int64)
                for b, (dx, dy) in enumerate(FAST_OFFSETS):
                    p = g[3 + dy : hh - 3 + dy, 3 + dx : ww - 3 + dx]
                    bright |= (p > c + t).astype(np.int64) << b
                    dark |= (p < c - t).astype(np.int64) << b
                arc = np.int64(0)
                for mask in (bright, dark):
                    for _ in range(16):
                        arc += (mask & 1).sum()
                        mask = mask >> 1  # noqa: PLW2901 — local shift copy
                # (the loop rebinding shifts a COPY reference; bright/dark
                # themselves are consumed below via the doubled ring)
                is_corner = np.zeros(c.shape, dtype=bool)
                for mask in (bright, dark):
                    ring = mask * 65537  # mask | mask << 16
                    for r in range(16):
                        is_corner |= ((ring >> r) & 511) == 511
                out[i] = (int(is_corner.sum()), int(arc), c.size)
            for j, name in enumerate(("n_fast", "arc_bits", "n_int")):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def with_box_stats(df: DataFrame, r: int = 2) -> DataFrame:
    """(2r+1)² box-filter statistics per image via an INTEGRAL IMAGE, in
    exact int64 — the O(1)-per-window summed-area-table trick (Crow 1984 /
    Viola-Jones) that makes box blur, local-mean thresholding, and
    Haar-like features affordable at any window size; the whole point of
    this operator is that the engine computes every window in O(1) from
    the 2-D prefix sum while the ORACLE recomputes each window by direct
    (2r+1)² gather — two genuinely different algorithms meeting on exact
    integers.

    Windows are evaluated at full-support centers y ∈ [r, h−r),
    x ∈ [r, w−r) on integer grayscale r+g+b (0..765). Outputs
      (box_sum long, box_max long, box_min long, amax_y long,
       amax_x long, n_win long):
    Σ of all window sums, the max/min window sum, the argmax center with
    (y, x)-smallest tie-break, and the window count. Arrow-batched
    mapInPandas; per image the windows come from ONE np.cumsum pass per
    axis + four slice gathers — no per-pixel Python."""
    schema = df.schema.simpleString()[7:-1] + (
        ", box_sum long, box_max long, box_min long,"
        " amax_y long, amax_x long, n_win long"
    )
    rr = int(r)
    k = 2 * rr + 1

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = np.zeros((len(pdf), 6), dtype=np.int64)
            for i, (payload, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ):
                w, h = int(w), int(h)
                if h < k or w < k:
                    continue
                img = _decode_row(payload, w, h, fmt=str(fmt))
                g = img.astype(np.int64).sum(axis=2)
                # summed-area table with a zero border row/col
                sat = np.zeros((h + 1, w + 1), dtype=np.int64)
                np.cumsum(g, axis=0, out=sat[1:, 1:])
                np.cumsum(sat[1:, 1:], axis=1, out=sat[1:, 1:])
                # S(y, x) over [y-r, y+r] x [x-r, x+r], centers interior
                s = (
                    sat[k:, k:]
                    - sat[:-k, k:]
                    - sat[k:, :-k]
                    + sat[:-k, :-k]
                )
                flat = s.ravel()
                am = int(flat.argmax())  # first occurrence = (y, x) min
                out[i] = (
                    int(flat.sum()),
                    int(flat[am]),
                    int(flat.min()),
                    am // s.shape[1] + rr,
                    am % s.shape[1] + rr,
                    flat.size,
                )
            for j, name in enumerate(
                ("box_sum", "box_max", "box_min", "amax_y", "amax_x", "n_win")
            ):
                pdf[name] = out[:, j]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


__all__.append("with_box_stats")
