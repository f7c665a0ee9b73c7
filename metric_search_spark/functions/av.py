"""Audio/video payload plumbing: decode / feature-extract / frame-sample over
opaque binary columns with typed metadata (task brief's multimodal columns,
completing the image module for the other two modalities).

Same architecture as functions/image.py: all heavy work runs in
``mapInPandas`` over Arrow batches; the numpy-native codecs
(sources/synth_av.py 'pcm16', 'rawv') decode for real, container-absent
codecs (mp3/aac/h264/vp9/...) are STUBBED behind ``decode_external_av``.
Audio feature sums use the flattened-batch ``np.add.reduceat`` pattern
(one vectorized pass per Arrow batch, no per-row Python arithmetic — the
same shape as operators/dedupe.simhash_col).

``sample_frames`` emits rows in the IMAGE table's payload schema
(bytes/w/h/fmt='raw'), so sampled frames feed the existing image operators
(with_image_stats / with_phash64 / resized) unchanged — video is image rows
after the sampling stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame

__all__ = [
    "decode_external_av",
    "with_audio_features",
    "sample_frame_indices",
    "sample_frames",
]

_SUPPORTED_AUDIO = {"pcm16"}
_SUPPORTED_VIDEO = {"rawv"}


def decode_external_av(payload: bytes, fmt: str) -> np.ndarray:
    """Stub for container-absent codecs (mp3/aac/h264/vp9/...). Schema and
    batch shape are codec-agnostic; plugging a real decoder in replaces this
    one function (image.decode_external is the same seam for stills)."""
    raise NotImplementedError(
        f"codec {fmt!r} needs an external library not present in this "
        "environment; supported here: pcm16 (audio), rawv (video)"
    )


def with_audio_features(df: DataFrame) -> DataFrame:
    """Adds rms / zcr (zero-crossing rate) / peak / duration_s decoded from
    the payload. One flattened numpy pass per Arrow batch: int16 samples
    concatenate into a single array, per-row sums come from
    ``np.add.reduceat`` over row offsets, and zero crossings from one global
    adjacent-product pass with the cross-row boundary pairs masked out.
    Integer accumulations are exact (n·32767² ≪ 2⁵³), so the derived
    doubles are reproducible bit-for-bit by any engine."""
    schema = df.schema.simpleString()[7:-1] + (
        ", rms double, zcr double, peak int, duration_s double"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            arrays = []
            for payload, ns, fmt in zip(pdf["bytes"], pdf["n_samples"], pdf["fmt"]):
                if str(fmt) not in _SUPPORTED_AUDIO:
                    decode_external_av(payload, str(fmt))
                arrays.append(
                    np.frombuffer(payload, dtype="<i2", count=int(ns)).astype(
                        np.int64
                    )
                )
            lens = np.array([len(a) for a in arrays], dtype=np.int64)
            flat = (
                np.concatenate(arrays) if arrays else np.empty(0, dtype=np.int64)
            )
            offs = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
            sum_sq = np.add.reduceat(flat * flat, offs) if len(flat) else lens
            peak = np.maximum.reduceat(np.abs(flat), offs) if len(flat) else lens
            # adjacent products < 0 = sign crossings; mask the len(rows)-1
            # boundary pairs that straddle two rows (every clip has >= 2
            # samples by construction, so offsets stay in range)
            if len(flat) > 1:
                neg = (flat[:-1] * flat[1:] < 0).astype(np.int64)
                neg[np.cumsum(lens)[:-1] - 1] = 0
                crossings = np.add.reduceat(neg, np.minimum(offs, len(neg) - 1))
            else:
                crossings = np.zeros(len(arrays), dtype=np.int64)
            pdf["rms"] = np.sqrt(sum_sq / lens)
            pdf["zcr"] = crossings / (lens - 1)
            pdf["peak"] = peak.astype(np.int32)
            pdf["duration_s"] = lens / pdf["sr"].to_numpy(np.float64)
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """Uniform k-point sampling grid: floor(j·n_frames/k), j in [0, k) —
    the shared index formula (engine + oracle both derive it from
    n_frames alone, so a sampling-stride bug breaks the twin match)."""
    return [(j * int(n_frames)) // k for j in range(k)]


def sample_frames(df: DataFrame, k: int) -> DataFrame:
    """Uniform k-frame sample of every video, emitted in the IMAGE payload
    schema (video_id, frame_idx, bytes, w, h, fmt='raw') so downstream image
    operators apply unchanged. Single-frame byte-range decode per sampled
    frame — O(k·frame), never O(video)."""
    import pandas as pd

    from metric_search_spark.sources.synth_av import decode_frame

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            vids, idxs, outs, ws, hs = [], [], [], [], []
            for video_id, payload, w, h, nf, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["fmt"],
            ):
                if str(fmt) not in _SUPPORTED_VIDEO:
                    decode_external_av(payload, str(fmt))
                for fi in sample_frame_indices(int(nf), k):
                    vids.append(video_id)
                    idxs.append(fi)
                    outs.append(
                        decode_frame(payload, int(w), int(h), fi, str(fmt))
                        .tobytes()
                    )
                    ws.append(int(w))
                    hs.append(int(h))
            yield pd.DataFrame(
                {
                    "video_id": vids,
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "bytes": outs,
                    "w": np.asarray(ws, dtype=np.int32),
                    "h": np.asarray(hs, dtype=np.int32),
                    "fmt": "raw",
                }
            )

    return df.mapInPandas(
        gen,
        schema="video_id string, frame_idx int, bytes binary, w int, h int,"
        " fmt string",
    )
