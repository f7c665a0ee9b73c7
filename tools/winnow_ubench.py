"""Winnowing kernel micro-bench (VERDICT r3 item 6 "Done ="): times the
flattened cross-document Arrow kernel (`functions.text._winnow_batch`)
against a per-document reference loop on a SHORT-document batch (where
per-row Python overhead dominates the old shape) and a long-document batch
(where both are numpy-bound). Pure pandas/numpy — no Spark session — so the
measurement isn't laundered through executor scheduling. Best-of-N: this
box co-tenants burst; min is the engine number.

Also asserts the two kernels are bit-identical on both batches before
timing anything.

Usage: python tools/winnow_ubench.py [n_docs=20000] [reps=7]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metric_search_spark.functions.text import (  # noqa: E402
    WINNOW_B,
    WINNOW_P,
    _winnow_batch,
)

K, W = 8, 4
POWERS = np.array(
    [WINNOW_B ** (K - 1 - j) % WINNOW_P for j in range(K)], dtype=np.int64
)


def perdoc_reference(pdf: pd.DataFrame) -> pd.DataFrame:
    """The pre-r4 kernel shape: fully vectorized WITHIN a document, Python
    loop ACROSS documents (git history functions/text.py @ c496c0c)."""
    from numpy.lib.stride_tricks import sliding_window_view

    ids, poss, fps = [], [], []
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        s = str(text)
        n = len(s) - K + 1
        if n < 1:
            continue
        codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
        H = (sliding_window_view(codes, K) @ POWERS) % WINNOW_P
        if n >= W:
            win = sliding_window_view(H, W)
            m = win.min(axis=1)
            rpos = W - 1 - np.argmax(win[:, ::-1] == m[:, None], axis=1)
            pos = np.arange(n - W + 1) + rpos + 1
        else:
            m = np.array([H.min()])
            pos = np.array([n - np.argmax(H[::-1] == m[0])])
        sel = np.unique(np.stack([pos, m], axis=1), axis=0)
        ids.extend([did] * len(sel))
        poss.append(sel[:, 0])
        fps.append(sel[:, 1])
    return pd.DataFrame(
        {
            "doc_id": ids,
            "pos": np.concatenate(poss) if poss else np.array([], np.int64),
            "fp": np.concatenate(fps) if fps else np.array([], np.int64),
        }
    )


def make_batch(n_docs: int, doc_len: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "), dtype="<U1")
    texts = [
        "".join(rng.choice(alpha, size=doc_len)) for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.astype({"doc_id": "int64", "pos": "int64", "fp": "int64"})
        .sort_values(["doc_id", "pos", "fp"])
        .reset_index(drop=True)
    )


def best_of(fn, pdf, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(pdf)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    for label, doc_len, nd in (
        ("short(24ch)", 24, n_docs),
        ("long(500ch)", 500, max(n_docs // 10, 1)),
    ):
        pdf = make_batch(nd, doc_len, seed=11)
        a = canon(_winnow_batch(pdf, "doc_id", "text", K, W, POWERS))
        b = canon(perdoc_reference(pdf))
        pd.testing.assert_frame_equal(a, b)
        t_flat = best_of(
            lambda p: _winnow_batch(p, "doc_id", "text", K, W, POWERS), pdf, reps
        )
        t_loop = best_of(perdoc_reference, pdf, reps)
        print(
            f"{label} docs={nd} rows={len(a)}: flat {t_flat*1e3:.1f} ms, "
            f"per-doc loop {t_loop*1e3:.1f} ms, speedup {t_loop/t_flat:.1f}x "
            f"(best of {reps}, bit-identical)"
        )


if __name__ == "__main__":
    main()
