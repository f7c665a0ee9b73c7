"""Audio/video multimodal plumbing: codec round-trips, feature kernels vs
independent per-row recomputes, frame sampling vs the generator's frames,
composition with the image operators, and the DuckDB hand-off oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metric_search_spark.functions.av import (
    decode_external_av,
    sample_frame_indices,
    sample_frames,
    with_audio_features,
)
from metric_search_spark.sources.synth_av import (
    decode_audio,
    decode_frame,
    generate_audio_rows,
    generate_video_rows,
)
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def test_decode_frame_is_exact_byte_range():
    """decode_frame(i) must equal the generator's frame i for every frame —
    the offset/stride ground truth the hand-off oracle can't see."""
    r = generate_video_rows(3, seed=42)[2]
    w, h, nf = r["w"], r["h"], r["n_frames"]
    full = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(nf, h, w, 3)
    for fi in (0, 1, nf // 2, nf - 1):
        np.testing.assert_array_equal(
            decode_frame(r["bytes"], w, h, fi, "rawv"), full[fi]
        )


def test_audio_features_match_per_row_recompute():
    spark = get_spark()
    rows = generate_audio_rows(40, seed=42)
    out = (
        with_audio_features(spark.createDataFrame(pd.DataFrame(rows)))
        .toPandas()
        .set_index("audio_id")
        .sort_index()
    )
    for r in rows:
        s = decode_audio(r["bytes"], r["n_samples"], r["fmt"]).astype(np.int64)
        got = out.loc[r["audio_id"]]
        assert got["rms"] == np.sqrt((s * s).sum() / len(s))
        assert got["peak"] == np.abs(s).max()
        assert got["zcr"] == ((s[:-1] * s[1:] < 0).sum()) / (len(s) - 1)
        assert got["duration_s"] == len(s) / r["sr"]


def test_sample_frames_feeds_image_pipeline():
    """Sampled frames are image-schema rows: phash64 + stats apply unchanged,
    and frame bytes equal the generator's frames at the uniform grid."""
    from metric_search_spark.functions.image import with_phash64

    spark = get_spark()
    rows = generate_video_rows(6, seed=42)
    frames = sample_frames(spark.createDataFrame(pd.DataFrame(rows)), 4)
    ph = with_phash64(frames).toPandas()
    assert len(ph) == 6 * 4 and ph["phash64"].notna().all()
    by_vid = {r["video_id"]: r for r in rows}
    for _, row in ph.iterrows():
        r = by_vid[row["video_id"]]
        assert row["frame_idx"] in sample_frame_indices(r["n_frames"], 4)
        want = decode_frame(r["bytes"], r["w"], r["h"], int(row["frame_idx"]), "rawv")
        got = np.frombuffer(row["bytes"], dtype=np.uint8).reshape(r["h"], r["w"], 3)
        np.testing.assert_array_equal(got, want)


def test_external_codec_stub():
    with pytest.raises(NotImplementedError):
        decode_external_av(b"", "mp3")


def test_av_queries_match_duckdb_oracles():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import (
        QUERIES,
        _o_audio_sql,
        _o_vframes_sql,
    )

    spark = get_spark()
    got_a = QUERIES["audio_stats"](spark, SF_DIR).toPandas()
    want_a = duckdb.sql(_o_audio_sql()).df()
    cols = ["audio_id", "rms", "zcr", "peak", "duration_s"]
    pd.testing.assert_frame_equal(
        got_a[cols].sort_values("audio_id").reset_index(drop=True),
        want_a[cols].sort_values("audio_id").reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got_a) == 256

    got_v = QUERIES["video_frame_sample"](spark, SF_DIR).toPandas()
    want_v = duckdb.sql(_o_vframes_sql()).df()
    cols = ["video_id", "frame_idx", "mean_r", "mean_g", "mean_b"]
    key = ["video_id", "frame_idx"]
    pd.testing.assert_frame_equal(
        got_v[cols].sort_values(key).reset_index(drop=True),
        want_v[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got_v) == 64 * 4
