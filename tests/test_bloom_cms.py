"""Bloom filter + Count-Min sketch: structural guarantees, numpy ground
truth, merge laws, and the zero-shuffle probe plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)
from metric_search_spark.operators.sampling import _A, _M

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _hash_np(v: np.ndarray, seed: int) -> np.ndarray:
    """Numpy twin of sampling.hash_col (independent of the SQL twin)."""
    x = (v.astype(np.int64) + 131071 * seed) % _M + 1
    h1 = (x * _A) % _M
    h1x = h1 ^ (h1 >> 13)
    return ((h1x % _M) * _A) % _M


M_BITS, K, SEED = 1024, 5, 11


def _bloom_truth(members: np.ndarray, probes: np.ndarray) -> np.ndarray:
    bits = np.zeros(M_BITS, dtype=bool)
    for i in range(K):
        bits[_hash_np(members, SEED + i) % M_BITS] = True
    pos = np.ones(len(probes), dtype=bool)
    for i in range(K):
        pos &= bits[_hash_np(probes, SEED + i) % M_BITS]
    return pos


def test_bloom_matches_numpy_truth(spark):
    members = np.arange(0, 500, 2)
    probes = np.arange(1000)
    mdf = spark.createDataFrame([(int(v),) for v in members], "v long")
    pdf = spark.createDataFrame([(int(v),) for v in probes], "v long")
    bits = bloom_build(mdf, [], "v", m_bits=M_BITS, k_hashes=K, seed=SEED)
    got = (
        bloom_probe(pdf, bits, [], "v", m_bits=M_BITS, k_hashes=K, seed=SEED)
        .orderBy("v")
        .collect()
    )
    want = _bloom_truth(members, probes)
    assert [r["bloom_positive"] for r in got] == want.tolist()
    # no false negatives, and the FP band is non-trivial at this (n, m, k)
    member_set = set(members.tolist())
    fps = sum(
        1 for r in got if r["bloom_positive"] and r["v"] not in member_set
    )
    assert all(r["bloom_positive"] for r in got if r["v"] in member_set)
    assert 0 < fps < 750  # 250 members in 1024 bits leaks a few, not all


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 50)], "v long")
    b = spark.createDataFrame([(i,) for i in range(50, 100)], "v long")
    both = a.unionByName(b)
    kw = dict(m_bits=M_BITS, k_hashes=K, seed=SEED)
    merged = (
        bloom_build(a, [], "v", **kw)
        .unionByName(bloom_build(b, [], "v", **kw))
        .distinct()
    )
    direct = bloom_build(both, [], "v", **kw)
    assert sorted(r["bit_pos"] for r in merged.collect()) == sorted(
        r["bit_pos"] for r in direct.collect()
    )


def test_bloom_grouped(spark):
    """Per-group filters don't bleed: v=7 is a member of g=a only."""
    mdf = spark.createDataFrame([(7, "a"), (9, "b")], "v long, g string")
    pdf = spark.createDataFrame([(7, "a"), (7, "b")], "v long, g string")
    bits = bloom_build(mdf, ["g"], "v", m_bits=M_BITS, k_hashes=K, seed=SEED)
    got = {
        (r["v"], r["g"]): r["bloom_positive"]
        for r in bloom_probe(
            pdf, bits, ["g"], "v", m_bits=M_BITS, k_hashes=K, seed=SEED
        ).collect()
    }
    assert got[(7, "a")] is True
    # 7 hashing positive in b's 5-bit filter is possible but astronomically
    # unlikely at m=1024 with one member; the deterministic hash fixes it.
    assert got[(7, "b")] is False


W, D = 64, 4


def _cms_truth(keys: np.ndarray, probes: np.ndarray) -> np.ndarray:
    est = np.full(len(probes), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(D):
        ctr = np.zeros(W, dtype=np.int64)
        np.add.at(ctr, _hash_np(keys, SEED + i) % W, 1)
        est = np.minimum(est, ctr[_hash_np(probes, SEED + i) % W])
    return est


def test_cms_matches_numpy_truth_and_overcounts_only(spark):
    rng = np.random.RandomState(3)
    keys = rng.zipf(1.7, size=5000) % 150  # skewed, like real key traffic
    probes = np.arange(150)
    kdf = spark.createDataFrame([(int(v),) for v in keys], "k long")
    pdf = spark.createDataFrame([(int(v),) for v in probes], "k long")
    sk = cms_build(kdf, [], "k", width=W, depth=D, seed=SEED)
    got = (
        cms_estimate(pdf, sk, [], "k", width=W, depth=D, seed=SEED)
        .orderBy("k")
        .collect()
    )
    want = _cms_truth(keys, probes)
    assert [r["est_count"] for r in got] == want.tolist()
    exact = np.bincount(keys, minlength=150)
    assert all(g >= e for g, e in zip(want.tolist(), exact.tolist()))
    # the heavy hitter is estimated tightly (CMS's raison d'être)
    top = int(np.argmax(exact))
    assert want[top] <= exact[top] + int(0.05 * len(keys))


def test_cms_merge_is_counter_sum(spark):
    a = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 5,) for i in range(80)], "k long")
    kw = dict(width=W, depth=D, seed=SEED)
    merged = (
        cms_build(a, [], "k", **kw)
        .unionByName(cms_build(b, [], "k", **kw))
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), [], "k", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_probe_plans_have_no_exchange(spark):
    """The scale contract: probing is k (resp. d) broadcast joins — zero
    Exchange on the probe side once the sketch relation is materialized."""
    mdf = spark.createDataFrame([(i,) for i in range(100)], "v long")
    pdf = spark.createDataFrame([(i,) for i in range(300)], "v long")
    bits = bloom_build(mdf, [], "v", m_bits=M_BITS, k_hashes=K, seed=SEED)
    from metric_search_spark.plans.inspect import count_exchanges

    bits_local = spark.createDataFrame(bits.collect(), bits.schema)
    probed = bloom_probe(
        pdf, bits_local, [], "v", m_bits=M_BITS, k_hashes=K, seed=SEED
    )
    assert count_exchanges(probed) == 0
    sk = cms_build(mdf, [], "v", width=W, depth=D, seed=SEED)
    sk_local = spark.createDataFrame(sk.collect(), sk.schema)
    est = cms_estimate(pdf, sk_local, [], "v", width=W, depth=D, seed=SEED)
    assert count_exchanges(est) == 0


def test_param_validation(spark):
    df = get_spark().createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(df, [], "v", m_bits=64, k_hashes=0)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, [], "v", m_bits=1)
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, [], "v", width=64, depth=99)
    with pytest.raises(ValueError, match="width"):
        cms_build(df, [], "v", width=0)
