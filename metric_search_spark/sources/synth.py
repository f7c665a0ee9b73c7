"""Deterministic synthetic image+caption table (FIXTURES.md F1/F2).

Schema (= BASELINE.json input_hint):
    image_id:string, bytes:binary, w:int, h:int, fmt:string,
    caption:string, phash:long

Images are seeded procedural scenes: a two-axis color gradient driven by a
latent coordinate (u, v) in [0,1)² plus gaussian blobs and noise. ``phash`` is
a locality-preserving hash DERIVED FROM THE PIXELS: the (R-mean, B-mean)
channel statistics — which track (u, v) by construction — quantized to 31 bits
each and Morton-interleaved (62 bits, always >= 0). So ``phash -> (x, y)``
decode (cells.coords_from_phash) yields meaningful 2-D centroids for cell
indexing, and the hash is reproducible from the decoded image alone.

Codecs (PIL is unavailable; both are numpy-native):
    'raw'  — uncompressed uint8 RGB, lossless
    'qnt'  — 6-bit/channel uniform quantizer, lossy; decodes at PSNR ≈ 46 dB
             (the >= 40 dB verification bar from BASELINE.json)

A separate ``phash64`` (classic 8x8 mean-threshold perceptual hash, like the
reference's image use case via SSIM — n-api/test/test.js:29-63) feeds the
near-duplicate operators.
"""

from __future__ import annotations

import numpy as np

from metric_search_spark.cells import interleave_bits, quantize

IMAGE_SCHEMA_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


# ------------------------------------------------------------------- codecs


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    """uint8 RGB (h, w, 3) -> payload bytes."""
    if fmt == "raw":
        return img.astype(np.uint8).tobytes()
    if fmt == "qnt":
        return (img.astype(np.uint8) >> 2).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload bytes -> uint8 RGB (h, w, 3)."""
    arr = np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "raw":
        return arr.copy()
    if fmt == "qnt":
        return np.minimum(arr.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ------------------------------------------------------ pixel-derived hashes


def image_stats(img: np.ndarray) -> tuple[float, float]:
    """The locality-preserving statistic pair: (mean R, mean B) / 256."""
    return float(img[..., 0].mean() / 256.0), float(img[..., 2].mean() / 256.0)


def phash_from_image(img: np.ndarray) -> int:
    """The table's phash column recomputed from pixels (the per-row invariant:
    decode(bytes) must reproduce phash for lossless fmt)."""
    sx, sy = image_stats(img)
    return int(interleave_bits(quantize(np.array([sx])), quantize(np.array([sy])))[0])


def phash64(img: np.ndarray) -> int:
    """Classic 8x8 mean-threshold perceptual hash (for near-dup operators)."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[ys[i]: ys[i + 1], xs[j]: xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0].astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF))


# ----------------------------------------------------------------- generator


def render_original(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Re-render the true pre-encoding image for a table row (image_id encodes
    the counter), replaying generate_rows' rng draw order exactly — the
    ground truth for the lossy-codec PSNR invariant."""
    i = int(str(image_id)[3:])
    rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
    u, v = rng.uniform(0, 1, 2)
    rng.choice((16, 24, 32))  # consume w draw
    rng.choice((16, 24, 32))  # consume h draw
    n_blobs = int(rng.integers(1, 5))
    rng.integers(0, 8)  # consume palette draw
    return render_image(rng, int(w), int(h), u, v, n_blobs)


def render_image(rng: np.random.Generator, w: int, h: int, u: float, v: float,
                 n_blobs: int) -> np.ndarray:
    """One procedural scene: gradient + blobs + noise, uint8 RGB (h, w, 3)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    xx /= max(w - 1, 1)
    yy /= max(h - 1, 1)
    r = np.full((h, w), u * 255.0)
    b = np.full((h, w), v * 255.0)
    g = 64.0 + 64.0 * np.sin(4.0 * np.pi * (xx * u + yy * v))
    for _ in range(n_blobs):
        bx, by = rng.uniform(0, 1, 2)
        amp = rng.uniform(20, 60)
        sig = rng.uniform(0.08, 0.25)
        blob = amp * np.exp(-((xx - bx) ** 2 + (yy - by) ** 2) / (2 * sig**2))
        g += blob
        r += 0.3 * blob
        b -= 0.2 * blob
    noise = rng.normal(0, 2.0, (h, w, 3))
    img = np.stack([r, g, b], axis=2) + noise
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_rows(
    n: int,
    seed: int = 42,
    sizes: tuple[int, ...] = (16, 24, 32),
    fmts: tuple[str, ...] = ("raw", "qnt"),
    start: int = 0,
) -> list[dict]:
    """Deterministic batch of image-table rows [start, start+n). Each row is
    keyed by its own rng(seed, i) so generation is order- and
    partition-independent (the property the distributed generator relies on).
    """
    return full_rows_for_ids(
        np.arange(start, start + n), seed=seed, sizes=sizes, fmts=fmts
    )


def full_rows_for_ids(
    ids_arr: np.ndarray,
    seed: int = 42,
    sizes: tuple[int, ...] = (16, 24, 32),
    fmts: tuple[str, ...] = ("raw", "qnt"),
) -> list[dict]:
    """generate_rows for an arbitrary id set — each row keyed by its own
    rng(seed, i), so any partitioning of ids reproduces the same table
    (the property spark_images_full's distributed tasks rely on)."""
    rows = []
    for i in np.asarray(ids_arr).tolist():
        i = int(i)
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        u, v = rng.uniform(0, 1, 2)
        w = int(rng.choice(sizes))
        h = int(rng.choice(sizes))
        n_blobs = int(rng.integers(1, 5))
        palette = int(rng.integers(0, 8))
        fmt = str(fmts[i % len(fmts)])
        img = render_image(rng, w, h, u, v, n_blobs)
        # phash from the DECODED payload so the invariant holds for lossy fmt too
        decoded = decode_image(encode_image(img, fmt), w, h, fmt)
        rows.append(
            {
                "image_id": f"img{i:012d}",
                "bytes": encode_image(img, fmt),
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"synthetic scene {i} blobs={n_blobs} palette={palette}",
                "phash": phash_from_image(decoded),
            }
        )
    return rows


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash (public splitmix64 constants): uint64 -> uint64."""
    z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_u01(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Deterministic per-id uniform [0,1) doubles (chunking-independent)."""
    seed_mix = np.uint64((seed * 0x517CC1B727220A95) & 0xFFFFFFFFFFFFFFFF)
    h = _splitmix64(
        _splitmix64(np.asarray(ids, dtype=np.uint64) ^ seed_mix) + np.uint64(salt)
    )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_lite_chunk(start: int, n: int, seed: int = 42) -> "pd.DataFrame":  # noqa: F821
    """Bench-scale generator: full schema, vectorized, tiny (4x4) raw payloads.

    Every value is a counter-based hash of the row id, so output is identical
    no matter how ids are chunked across tasks (partition-independent), and
    phash still derives from the rendered pixels (channel means). ~10^6
    rows/sec, so bench tables of millions of rows are cheap to materialize.
    """
    return lite_rows_for_ids(np.arange(start, start + n, dtype=np.uint64), seed)


def lite_rows_for_ids(ids_arr: np.ndarray, seed: int = 42) -> "pd.DataFrame":  # noqa: F821
    import pandas as pd

    ids_arr = np.asarray(ids_arr, dtype=np.uint64)
    n = len(ids_arr)
    u = _hash_u01(ids_arr, 1, seed)
    v = _hash_u01(ids_arr, 2, seed)
    n_blobs = (_hash_u01(ids_arr, 3, seed) * 4).astype(np.int64) + 1
    palette = (_hash_u01(ids_arr, 4, seed) * 8).astype(np.int64)
    w = h = 4
    # batched render: gradient channels + hashed per-pixel noise
    npix = h * w * 3
    noise = np.empty((n, npix))
    for p in range(npix):
        noise[:, p] = (_hash_u01(ids_arr, 100 + p, seed) - 0.5) * 8.0
    noise = noise.reshape(n, h, w, 3)
    r = u[:, None, None] * 255.0 + noise[..., 0]
    g = 128.0 + noise[..., 1]
    b = v[:, None, None] * 255.0 + noise[..., 2]
    imgs = np.clip(np.stack([r, g, b], axis=3), 0, 255).astype(np.uint8)
    sx = imgs[..., 0].mean(axis=(1, 2)) / 256.0
    sy = imgs[..., 2].mean(axis=(1, 2)) / 256.0
    phash = interleave_bits(quantize(sx), quantize(sy)).astype(np.int64)
    ids = ids_arr.astype(np.int64)
    return pd.DataFrame(
        {
            "image_id": [f"img{i:012d}" for i in ids],
            "bytes": [im.tobytes() for im in imgs],
            "w": np.full(n, w, dtype=np.int32),
            "h": np.full(n, h, dtype=np.int32),
            "fmt": "raw",
            "caption": [
                f"synthetic scene {i} blobs={k} palette={p}"
                for i, k, p in zip(ids, n_blobs, palette)
            ],
            "phash": phash,
        }
    )


def write_images_parquet(path: str, n: int, seed: int = 42, lite: bool = False,
                         chunk: int = 100_000) -> str:
    """Materialize an image table to parquet (row-group per chunk)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    writer = pq.ParquetWriter(path, schema)
    try:
        for start in range(0, n, chunk):
            m = min(chunk, n - start)
            if lite:
                df = generate_lite_chunk(start, m, seed)
            else:
                df = pd.DataFrame(generate_rows(m, seed=seed, start=start))
            df["w"] = df["w"].astype("int32")
            df["h"] = df["h"].astype("int32")
            writer.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False))
    finally:
        writer.close()
    return path


def spark_images(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed image-table generation: spark.range partitions -> mapInPandas
    chunk renderer. This is how a 10^9-row table would be materialized on a
    real cluster (each task renders its own id range; no driver bottleneck)."""
    from pyspark.sql import functions as F

    out_schema = (
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            yield lite_rows_for_ids(ids, seed)

    rng_df = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=out_schema)


def spark_images_full(spark, n: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed FULL-renderer image table (generate_rows pixels: 16–32 px
    procedural scenes, raw/qnt alternating) — the variant for operators whose
    semantics need real image structure (pHash near-dup, SSIM); spark_images'
    lite 4×4 payloads degenerate an 8×8 block hash. Same task shape: each
    task renders its own id range, no driver bottleneck."""
    import pandas as pd

    out_schema = (
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            yield pd.DataFrame(full_rows_for_ids(ids, seed))

    rng_df = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=out_schema)
