"""Metric library parity vs independent python oracles (reference semantics
cited in core/metrics.py docstrings)."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.core.metrics import (
    SSIM,
    TWED,
    Cosine,
    Edit,
    Euclidean,
    EuclideanThresholded,
    Manhattan,
    PNorm,
    get_metric,
)


def _twed_oracle(a, b, nu=1.0, lam=0.0):
    """Direct O(n·m) DP, textbook form (Marteau 2009; time stamps = index)."""
    a, b = list(a), list(b)
    n, m = len(a), len(b)
    D = np.full((n, m), np.inf)
    D[0][0] = abs(a[0] - b[0])
    for j in range(1, m):
        D[0][j] = D[0][j - 1] + abs(b[j - 1] - b[j]) + nu + lam
    for i in range(1, n):
        D[i][0] = D[i - 1][0] + abs(a[i - 1] - a[i]) + nu + lam
        for j in range(1, m):
            c1 = D[i - 1][j] + abs(a[i - 1] - a[i]) + nu + lam
            c2 = D[i][j - 1] + abs(b[j - 1] - b[j]) + nu + lam
            c3 = (
                D[i - 1][j - 1]
                + abs(a[i] - b[j])
                + abs(a[i - 1] - b[j - 1])
                + nu * (abs(i - j) + abs(i - 1 - (j - 1)))
            )
            D[i][j] = min(c1, c2, c3)
    return D[n - 1][m - 1]


def test_twed_matches_direct_dp():
    rng = np.random.default_rng(4)
    twed = TWED()
    for _ in range(10):
        a = rng.uniform(-5, 5, rng.integers(2, 20))
        b = rng.uniform(-5, 5, rng.integers(2, 20))
        np.testing.assert_allclose(twed.one(a, b), _twed_oracle(a, b), atol=1e-10)


def test_twed_params():
    a, b = [0.0, 1.0, 2.0], [0.0, 1.5, 2.0]
    t2 = TWED(elastic=0.5, penalty=0.25)
    np.testing.assert_allclose(
        t2.one(a, b), _twed_oracle(a, b, nu=0.5, lam=0.25), atol=1e-12
    )


def test_edit_levenshtein():
    e = Edit()
    assert e.one("kitten", "sitting") == 3
    assert e.one("", "abc") == 3
    assert e.one("abc", "abc") == 0
    assert e.one("flaw", "lawn") == 2


def test_standard_metrics_cross_consistency():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(20, 6))
    B = rng.normal(size=(15, 6))
    for m in (Euclidean(), Manhattan(), PNorm(p=3), Cosine(), EuclideanThresholded()):
        C = m.cross(A, B)
        for i in (0, 7, 19):
            for j in (0, 5, 14):
                np.testing.assert_allclose(C[i, j], m.one(A[i], B[j]), atol=1e-9)
        np.testing.assert_allclose(m.batch(A, B[0]), C[:, 0], atol=1e-9)


def test_cosine_is_similarity_quirk():
    c = Cosine()
    assert np.isclose(c.one([1, 0], [1, 0]), 1.0)  # identical → 1, NOT 0


def test_ssim_identical_images_zero():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16)).astype(float)
    s = SSIM()
    assert s.one(img, img) < 1e-9
    other = np.clip(img + rng.normal(0, 30, img.shape), 0, 255)
    assert s.one(img, other) > s.one(img, np.clip(img + 1, 0, 255))


def test_ssim_quirk_parity_window():
    """The reference's size_t-underflow gaussian zeroes weights above/left of
    center; quirk and corrected modes must differ."""
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(14, 14)).astype(float)
    b = rng.integers(0, 256, size=(14, 14)).astype(float)
    quirk = SSIM(quirk_parity=True).one(a, b)
    fixed = SSIM(quirk_parity=False).one(a, b)
    assert not np.isclose(quirk, fixed)


def test_metric_factory():
    assert isinstance(get_metric("l2"), Euclidean)
    assert isinstance(get_metric("levenshtein"), Edit)
    assert get_metric("p_norm", p=2.0).p == 2.0
    with pytest.raises(KeyError):
        get_metric("nope")


def test_dimension_accessor():
    """Dimension accessor parity (dimension.hpp:16-64): field extraction via
    accessor callables + inner metric on the extracted vectors."""
    from metric_search_spark.core.metrics import Dimension, Euclidean

    recs = [{"a": 3.0, "b": 4.0, "label": "x"}, {"a": 0.0, "b": 0.0, "label": "y"}]
    dim = Dimension([lambda r: r["a"], lambda r: r["b"]], Euclidean())
    assert dim.extract(recs[0]) == [3.0, 4.0]
    np.testing.assert_allclose(dim.get_distance(recs[0], recs[1]), 5.0)
    np.testing.assert_allclose(dim.one(recs[0], recs[1]), 5.0)


def test_twed_sparse_and_timestamped():
    """Sparse TWED variant (reference TWED.cpp:84-236): zero-padding quirks
    preserved, timestamped DP == dense DP when times are 0..n−1."""
    twed = TWED()
    rng = np.random.default_rng(3)
    # dense equivalence: explicit times 0..n−1 reproduce the dense kernel
    for _ in range(5):
        a = rng.random(int(rng.integers(2, 12)))
        b = rng.random(int(rng.integers(2, 12)))
        np.testing.assert_allclose(
            twed.one_t(a, np.arange(len(a)), b, np.arange(len(b))),
            twed.one(a, b),
            atol=1e-12,
        )
    # padding golden (hand-traced through TWED.cpp:100-137 branch logic):
    # size 6, single non-zero at index 2 → back-pad 0, front-pad 1, tail 3, 5
    t, v = TWED.add_zero_padding([2], [5.0], 6)
    assert list(t) == [0, 1, 2, 3, 5] and list(v) == [0, 0, 5.0, 0, 0]
    # fully dense input: padding is the identity
    t, v = TWED.add_zero_padding([0, 1, 2], [1.0, 2.0, 3.0], 3)
    assert list(t) == [0, 1, 2] and list(v) == [1.0, 2.0, 3.0]
    # empty input: index-0 and size−1 sentinels
    t, v = TWED.add_zero_padding([], [], 4)
    assert list(t) == [0, 3] and list(v) == [0.0, 0.0]
    # one_sparse == one_t over the padded pairs
    got = twed.one_sparse([2], [5.0], 6, [0, 4], [1.0, 2.0], 6)
    ta, va = TWED.add_zero_padding([2], [5.0], 6)
    tb, vb = TWED.add_zero_padding([0, 4], [1.0, 2.0], 6)
    np.testing.assert_allclose(got, twed.one_t(va, ta, vb, tb), atol=1e-12)


def test_twed_many_batched_matches_one():
    twed = TWED(elastic=0.7, penalty=0.1)
    rng = np.random.default_rng(5)
    S = rng.random((17, 9))
    b = rng.random(13)
    got = twed.many(S, b)
    want = [twed.one(row, b) for row in S]
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_emd_cdf_identity_and_grid():
    """EMD (reference EMD.cpp) vs the exact 1-D identity: for equal-mass
    histograms with |i−j| ground cost, EMD == L1 distance of the CDFs."""
    from metric_search_spark.core.metrics import EMD, ground_distance_matrix_of_2dgrid

    e = EMD()
    rng = np.random.default_rng(11)
    for _ in range(6):
        n = int(rng.integers(2, 24))
        a = rng.random(n)
        b = rng.random(n)
        b *= a.sum() / b.sum()
        want = np.abs(np.cumsum(a) - np.cumsum(b)).sum()
        np.testing.assert_allclose(e.one(a, b), want, atol=1e-8)
    assert np.isclose(e.one([1, 0, 0], [0, 0, 1]), 2.0)
    assert e.one([1, 2, 3], [1, 2, 3]) < 1e-12
    g = ground_distance_matrix_of_2dgrid(3, 3)
    a9 = np.zeros(9); a9[0] = 1.0
    b9 = np.zeros(9); b9[8] = 1.0
    np.testing.assert_allclose(EMD(ground=g).one(a9, b9), np.sqrt(8), atol=1e-10)


def test_emd_integer_histograms_integral_optimum():
    """The emd_histograms driver query's contract: balanced INTEGER
    histograms with |i−j| ground cost have an integral optimum equal to the
    CDF L1 closed form — the SSP solver must land exactly on it (the query
    casts to BIGINT on this guarantee)."""
    from metric_search_spark.core.metrics import EMD

    e = EMD()
    rng = np.random.default_rng(7)
    for _ in range(8):
        n = int(rng.integers(2, 17))
        a = rng.integers(0, 20, n).astype(np.float64)
        b = rng.permutation(a)  # same multiset ⇒ equal mass
        want = float(np.abs(np.cumsum(a) - np.cumsum(b)).sum())
        got = e.one(a, b)
        assert abs(got - round(got)) < 1e-9
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_emd_extra_mass_reference_semantics():
    """Unbalanced histograms follow the reference's emd-hat contract
    (EMD.cpp:699-726 supplier swap; :762-763 default penalty = maxC;
    :967-973 dist = transport + |Σp − Σq|·penalty) — hand-computed cases."""
    from metric_search_spark.core.metrics import EMD

    e = EMD()
    # transport 1 unit bin0→bin1 (cost 1) + extra mass 1 × maxC 1 = 2
    np.testing.assert_allclose(e.one([2, 0], [0, 1]), 2.0, atol=1e-10)
    # supplier swap: same by symmetry of the semantics
    np.testing.assert_allclose(e.one([0, 1], [2, 0]), 2.0, atol=1e-10)
    # transport 1 unit cost 2 + extra 2 × maxC 2 = 6
    np.testing.assert_allclose(e.one([3, 0, 0], [0, 0, 1]), 6.0, atol=1e-10)
    # all mass unmatched: pure extra-mass charge
    np.testing.assert_allclose(e.one([1, 1], [0, 0]), 2.0, atol=1e-10)
    np.testing.assert_allclose(e.one([0, 0], [0, 0]), 0.0, atol=1e-10)
    # explicit penalty overrides the maxC default
    e0 = EMD(extra_mass_penalty=0.0)
    np.testing.assert_allclose(e0.one([2, 0], [0, 1]), 1.0, atol=1e-10)
    e5 = EMD(extra_mass_penalty=5.0)
    np.testing.assert_allclose(e5.one([2, 0], [0, 1]), 6.0, atol=1e-10)
    # free disposal picks the CHEAP mass to keep: supplier [1,1] → sink [1]
    # at |i−j| cost: serve bin0 from bin0 (cost 0), dispose bin1 (+1·maxC 1)
    np.testing.assert_allclose(e.one([1, 1], [1, 0]), 1.0, atol=1e-10)
