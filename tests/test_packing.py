"""Sequence packing: greedy semantics, oversize docs, shard independence."""

from __future__ import annotations

import pytest

from metric_search_spark.operators.packing import pack_sequences

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_pack_greedy_semantics(spark):
    # one shard (ids all ≡ 0 mod 64): lens 5,3,4,10,2 at budget 8
    # -> [5,3 | 4 | 10 | 2]: doc 64*3 is oversize-free 10>8 sits alone,
    # and the 2 after it starts a NEW bin (greedy never back-fills)
    rows = [(0, 5), (64, 3), (128, 4), (192, 10), (256, 2)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r.doc_id: r for r in pack_sequences(df, 8, n_shards=64).collect()}
    got = [(out[i].bin_local, out[i].fill_after) for i in (0, 64, 128, 192, 256)]
    assert got == [(1, 5), (1, 8), (2, 4), (3, 10), (4, 2)]
    assert all(out[i].shard == 0 for i in out)


def test_pack_shards_are_independent(spark):
    # same lens in two shards -> identical per-shard assignments
    rows = [(0, 5), (64, 5), (1, 5), (65, 5)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r.doc_id: (r.shard, r.bin_local, r.fill_after)
           for r in pack_sequences(df, 8, n_shards=64).collect()}
    assert out[0] == (0, 1, 5) and out[64] == (0, 2, 5)
    assert out[1] == (1, 1, 5) and out[65] == (1, 2, 5)


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, n_chars long")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
