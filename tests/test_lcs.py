"""LCS kernel: textbook goldens, empty/degenerate inputs, and brute-force
recursive-definition parity on random categorical sequences."""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from metric_search_spark.core.metrics import lcs_many


def test_textbook_goldens():
    # CLRS example: X=ABCBDAB, Y=BDCABA -> LCS length 4 (BCBA)
    out = lcs_many([list("ABCBDAB")], list("BDCABA"))
    assert out[0] == 4
    # identical -> full length; disjoint -> 0; subsequence -> its length
    assert lcs_many([list("abc")], list("abc"))[0] == 3
    assert lcs_many([list("abc")], list("xyz"))[0] == 0
    assert lcs_many([list("axbycz")], list("abc"))[0] == 3


def test_degenerate():
    assert lcs_many([[]], list("ab"))[0] == 0
    assert lcs_many([list("ab")], [])[0] == 0
    assert list(lcs_many([], list("ab"))) == []


def _brute(a: tuple, b: tuple) -> int:
    @lru_cache(maxsize=None)
    def f(i: int, j: int) -> int:
        if i == 0 or j == 0:
            return 0
        if a[i - 1] == b[j - 1]:
            return f(i - 1, j - 1) + 1
        return max(f(i - 1, j), f(i, j - 1))

    return f(len(a), len(b))


def test_brute_parity_random():
    rng = np.random.default_rng(2)
    alpha = list("pqrs")
    anchor = [alpha[i] for i in rng.integers(0, 4, 20)]
    seqs = [
        [alpha[i] for i in rng.integers(0, 4, int(rng.integers(0, 25)))]
        for _ in range(40)
    ]
    got = lcs_many(seqs, anchor)
    for s, g in zip(seqs, got):
        assert g == _brute(tuple(s), tuple(anchor))
