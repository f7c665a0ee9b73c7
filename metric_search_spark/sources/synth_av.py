"""Deterministic synthetic audio + video tables (multimodal columns beyond
images — task brief: "treat image/audio/video as opaque binary columns with
typed metadata").

Payloads are opaque ``binary`` columns with typed metadata, exactly like the
image table; the numpy-native codecs here are REAL (decode is exact), while
container-absent codecs (mp3/aac/h264/vp9/...) are stubbed behind
``functions.av.decode_external_av`` the same way image.decode_external stubs
PIL-class formats.

Codecs:
    audio 'pcm16' — int16 little-endian mono samples; metadata (sr, n_samples)
    video 'rawv'  — concatenated raw uint8 RGB frames, frame-major
                    (n_frames, h, w, 3); metadata (w, h, n_frames, fps)

Rows are counter-keyed (rng(seed, i)) like sources/synth.py, so any prefix of
the table is identical at every scale and generation is order- and
partition-independent.
"""

from __future__ import annotations

import numpy as np

AUDIO_SCHEMA_COLS = ["audio_id", "bytes", "sr", "n_samples", "fmt"]
VIDEO_SCHEMA_COLS = ["video_id", "bytes", "w", "h", "n_frames", "fps", "fmt"]


# ------------------------------------------------------------------- codecs


def encode_audio(samples: np.ndarray) -> bytes:
    """int16 mono samples -> 'pcm16' payload."""
    return samples.astype("<i2").tobytes()


def decode_audio(payload: bytes, n_samples: int, fmt: str) -> np.ndarray:
    """'pcm16' payload -> int16 mono samples."""
    if fmt != "pcm16":
        raise ValueError(f"unknown audio fmt {fmt!r}")
    return np.frombuffer(payload, dtype="<i2", count=n_samples).copy()


def encode_video(frames: np.ndarray) -> bytes:
    """uint8 (n_frames, h, w, 3) -> 'rawv' payload."""
    return frames.astype(np.uint8).tobytes()


def decode_frame(
    payload: bytes, w: int, h: int, frame_idx: int, fmt: str
) -> np.ndarray:
    """Single-frame decode from a 'rawv' payload — O(frame), not O(video):
    a byte-range view of the payload, the property a real container format
    (keyframe seek) gives you."""
    if fmt != "rawv":
        raise ValueError(f"unknown video fmt {fmt!r}")
    fsz = w * h * 3
    off = frame_idx * fsz
    arr = np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=off)
    return arr.reshape(h, w, 3).copy()


# --------------------------------------------------------------- generators


def generate_audio_rows(n: int, seed: int = 42, start: int = 0) -> list[dict]:
    """Deterministic pcm16 clips: two-tone sine mixes + noise, amplitude and
    length keyed per row."""
    rows = []
    for i in range(start, start + n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 7, i]))
        sr = int(rng.choice((8000, 16000)))
        dur = float(rng.uniform(0.05, 0.25))
        n_samples = int(sr * dur)
        t = np.arange(n_samples) / sr
        f1, f2 = rng.uniform(80, 2000, 2)
        amp = rng.uniform(0.1, 0.8)
        wave = amp * (np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t))
        wave = wave + rng.normal(0, 0.02, n_samples)
        samples = np.clip(wave * 32767.0 / 1.6, -32768, 32767).astype(np.int16)
        rows.append(
            {
                "audio_id": f"aud{i:012d}",
                "bytes": encode_audio(samples),
                "sr": sr,
                "n_samples": n_samples,
                "fmt": "pcm16",
            }
        )
    return rows


def generate_video_rows(n: int, seed: int = 42, start: int = 0) -> list[dict]:
    """Deterministic rawv clips: a moving gaussian blob over a gradient, one
    frame per step — frame content varies monotonically so frame-sampling
    bugs (wrong stride/offset) change downstream stats."""
    rows = []
    for i in range(start, start + n):
        rng = np.random.default_rng(np.random.SeedSequence([seed, 9, i]))
        w = int(rng.choice((16, 24)))
        h = int(rng.choice((16, 24)))
        n_frames = int(rng.integers(8, 33))
        fps = int(rng.choice((10, 24)))
        x0, y0 = rng.uniform(0.2, 0.8, 2)
        dx, dy = rng.uniform(-0.5, 0.5, 2) / n_frames
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
        for f in range(n_frames):
            cx, cy = (x0 + dx * f) * w, (y0 + dy * f) * h
            blob = 200.0 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (0.1 * w * h))
            base = 30.0 + 80.0 * xx / w + (f * 3.0)
            for c in range(3):
                frames[f, :, :, c] = np.clip(base + blob * (0.5 + 0.25 * c), 0, 255)
        rows.append(
            {
                "video_id": f"vid{i:012d}",
                "bytes": encode_video(frames),
                "w": w,
                "h": h,
                "n_frames": n_frames,
                "fps": fps,
                "fmt": "rawv",
            }
        )
    return rows
