"""Constant-state streaming Bloom dedup: numpy ground truth for the
emitted set (including deterministic false-positive drops), the
no-duplicate-emission guarantee, and resume-from-state."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from metric_search_spark.operators.sampling import _A, _M
from metric_search_spark.streaming.dedup import stream_bloom_dedup

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _hash_np(v: np.ndarray, seed: int) -> np.ndarray:
    x = (v.astype(np.int64) + 131071 * seed) % _M + 1
    h1 = (x * _A) % _M
    h1x = h1 ^ (h1 >> 13)
    return ((h1x % _M) * _A) % _M


M, K, SEED = 4096, 5, 3


def _truth_emitted(batches: list[np.ndarray]) -> list[int]:
    bits = np.zeros(M, dtype=bool)
    emitted: list[int] = []
    for ids in batches:
        pos = np.ones(len(ids), dtype=bool)
        for i in range(K):
            pos &= bits[_hash_np(ids, SEED + i) % M]
        novel = np.unique(ids[~pos])
        emitted.extend(int(v) for v in novel)
        for i in range(K):
            bits[_hash_np(novel, SEED + i) % M] = True
    return sorted(emitted)


def _stage(batches: list[np.ndarray]) -> str:
    d = tempfile.mkdtemp(prefix="msk_bloomstage_")
    for bi, ids in enumerate(batches):
        t = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array([0] * len(ids), pa.timestamp("us")),
                "user_id": pa.array(ids % 7, pa.int64()),
                "event_type": pa.array(["e"] * len(ids)),
                "value": pa.array([0.0] * len(ids)),
                "props": pa.array(["{}"] * len(ids)),
            }
        )
        f = os.path.join(d, f"b{bi}.parquet")
        pq.write_table(t, f)
        st = os.stat(f).st_mtime
        os.utime(f, (st + bi, st + bi))
    return d


def test_emitted_matches_truth_with_false_positives(spark):
    # 1,500 keys through a deliberately small filter (m=4096, k=5) so the
    # second batch's novel keys hit real false positives
    b1 = np.arange(0, 1000)
    b2 = np.arange(500, 1500)  # 500 dups + 1000 novel
    d = _stage([b1, b2])
    got = sorted(
        r["event_id"]
        for r in stream_bloom_dedup(
            spark, d, "event_id", m_bits=M, k_hashes=K, seed=SEED
        ).collect()
    )
    want = _truth_emitted([b1, b2])
    assert got == want
    # duplicates all dropped, and the FP band is real but not degenerate
    dropped_novel = set(range(1500)) - set(want)
    assert all(v >= 1000 for v in dropped_novel)  # only novel keys drop
    assert 0 < len(dropped_novel) < 500


def test_no_key_emitted_twice_and_intra_batch_dedup(spark):
    ids = np.array([1, 1, 2, 3, 3, 3, 4])
    d = _stage([ids, ids])
    rows = stream_bloom_dedup(
        spark, d, "event_id", m_bits=M, k_hashes=K, seed=SEED
    ).collect()
    got = [r["event_id"] for r in rows]
    assert sorted(got) == sorted(set(got)) == [1, 2, 3, 4]


def test_resume_is_noop_after_completion(spark):
    b1 = np.arange(0, 200)
    d = _stage([b1])
    sd = tempfile.mkdtemp(prefix="msk_bloomstate_")
    first = stream_bloom_dedup(
        spark, d, "event_id", m_bits=M, k_hashes=K, seed=SEED, state_dir=sd
    ).count()
    again = stream_bloom_dedup(
        spark, d, "event_id", m_bits=M, k_hashes=K, seed=SEED, state_dir=sd
    ).count()
    assert first == again == 200  # checkpoint replays nothing, state intact
