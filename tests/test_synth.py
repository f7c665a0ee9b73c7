"""Synthetic image table + codec tests (FIXTURES.md F1; BASELINE.json per-row
invariants: decoded pixels allclose / PSNR >= 40 dB, captions byte-equal,
phash reproducible from pixels)."""

import numpy as np

from metric_search_spark.cells import coords_from_phash
from metric_search_spark.sources import synth


def test_raw_codec_lossless():
    rows = synth.generate_rows(8, seed=42, fmts=("raw",))
    for r in rows:
        img = synth.decode_image(r["bytes"], r["w"], r["h"], "raw")
        assert synth.psnr(img, img) == float("inf")
        assert synth.phash_from_image(img) == r["phash"]


def test_qnt_codec_psnr_above_40db():
    rng = np.random.default_rng(0)
    for _ in range(5):
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        dec = synth.decode_image(synth.encode_image(img, "qnt"), 24, 24, "qnt")
        assert synth.psnr(img, dec) >= 40.0


def test_rows_deterministic_and_chunk_independent():
    a = synth.generate_rows(6, seed=42)
    b = synth.generate_rows(3, seed=42) + synth.generate_rows(3, seed=42, start=3)
    for ra, rb in zip(a, b):
        assert ra["caption"] == rb["caption"]  # byte-equal captions
        assert ra["bytes"] == rb["bytes"]
        assert ra["phash"] == rb["phash"]


def test_phash_locality():
    """Images with close latent coords decode to close (x, y) centroids."""
    rows = synth.generate_rows(40, seed=42, fmts=("raw",))
    ph = np.array([r["phash"] for r in rows])
    x, y = coords_from_phash(ph)
    assert np.all((x >= 0) & (x < 1) & (y >= 0) & (y < 1))
    # recompute stats from pixels and check the decode matches them
    for r, xi, yi in zip(rows, x, y):
        img = synth.decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        sx, sy = synth.image_stats(img)
        assert abs(sx - xi) < 1e-6 and abs(sy - yi) < 1e-6


def test_lite_chunk_independence():
    a = synth.generate_lite_chunk(0, 10)
    b = synth.lite_rows_for_ids(np.array([3, 7]))
    assert a.iloc[3]["phash"] == b.iloc[0]["phash"]
    assert a.iloc[7]["caption"] == b.iloc[1]["caption"]


def test_write_parquet(tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "imgs.parquet")
    synth.write_images_parquet(p, 50, lite=True)
    t = pq.read_table(p)
    assert t.num_rows == 50
    assert t.schema.names == synth.IMAGE_SCHEMA_COLS
    assert np.all(np.asarray(t["phash"]) >= 0)


def test_table_io_seam(tmp_path):
    """Parquet path round-trips; Iceberg catalog idents fail with a clear
    message when the runtime jar is absent (this container)."""
    import pytest

    from metric_search_spark.sources.tables import (
        iceberg_available,
        read_table,
        write_table,
    )
    from tests.sparkutil import get_spark

    spark = get_spark()
    df = spark.range(10).withColumnRenamed("id", "x")
    p = str(tmp_path / "t.parquet")
    write_table(df, p, mode="overwrite")
    assert read_table(spark, p).count() == 10
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            read_table(spark, "db.tbl")
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            write_table(df, "db.tbl")
