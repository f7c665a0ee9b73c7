"""Batch metric kernels (the reference's scalar-function surface, re-done in numpy).

The reference selects metrics dynamically via an enum and wraps them in a
``MetricWrapper`` (see /root/reference/n-api/metric_search_js.hpp:8-178); here a
metric is a small class with two entry points:

- ``one(a, b) -> float``                 scalar distance between two records
- ``batch(A, b) -> np.ndarray``          vectorized distances from many records to one
- ``pairwise(A, B) -> np.ndarray``       row-wise distances between two record batches

``batch`` is the cover-tree kernel hot path (one probe vs. all children of a
node); ``pairwise`` is the join hot path (Arrow batch vs. Arrow batch). All
numeric kernels are pure numpy (no per-row Python in the Spark path; the
python-level ``one`` exists for the unit-test oracle).

Semantics parity notes (each cites the reference implementation it mirrors):

- ``Euclidean``      sqrt(sum((a-b)^2))       — Standards.cpp:28-40
- ``EuclideanThresholded`` min(thres, factor*L2), defaults thres=1000 factor=3000
                                               — Standards.cpp:42-54, Standards.hpp:65-66
- ``Manhattan``      sum|a-b|                  — Standards.cpp:56-68
- ``PNorm``          (sum|a-b|^p)^(1/p), p=1   — Standards.cpp:70-82, Standards.hpp:49
- ``Cosine``         dot/(|a||b|) — returns SIMILARITY, not a distance (reference
                     quirk preserved)          — Standards.cpp:84-96
- ``TWED``           time-warp edit distance DP over (value, index-as-time) with
                     stiffness ``elastic`` (default 1) and ``penalty`` (default 0)
                                               — TWED.cpp:10-76, TWED.hpp:30-33
- ``Edit``           Levenshtein 2-row DP      — Edit.cpp:11-64 (Spark path uses the
                     built-in ``F.levenshtein``)
- ``SSIM``           11x11-window structural-similarity distance with
                     C1=(0.01*L)^2, C2=(0.03*L)^2, L=255, masking=2.0
                                               — SSIM.cpp:57-169, SSIM.hpp:16-17.
                     The reference computes its gaussian window with size_t
                     subtraction (SSIM.cpp:27: ``(x - d) * (x - d)`` underflows for
                     x < d), which zeroes all weights above/left of center. We
                     reproduce that behavior under ``quirk_parity=True`` (default,
                     for row-for-row parity) and offer the mathematically intended
                     window with ``quirk_parity=False``.
- ``AbsDiff``        |a-b| on scalars — the custom metric used by the reference's
                     own unit tests (tests/test_api.cpp:18-23)
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "Metric",
    "EMD",
    "ground_distance_matrix_of_2dgrid",
    "AbsDiff",
    "Dimension",
    "Euclidean",
    "EuclideanThresholded",
    "Manhattan",
    "PNorm",
    "Cosine",
    "TWED",
    "DTW",
    "Edit",
    "SSIM",
    "get_metric",
    "METRICS",
]


def _as_matrix(A) -> np.ndarray:
    """Stack a batch of equal-length numeric records into an (n, d) float array."""
    if isinstance(A, np.ndarray) and A.ndim == 2:
        return A.astype(np.float64, copy=False)
    return np.asarray([np.asarray(a, dtype=np.float64).ravel() for a in A], dtype=np.float64)


class Metric:
    """Base: subclasses implement ``one``; ``batch``/``pairwise`` default to loops
    (numeric subclasses override with vectorized numpy)."""

    name = "metric"

    def one(self, a, b) -> float:
        raise NotImplementedError

    def __call__(self, a, b) -> float:
        return self.one(a, b)

    def batch(self, A, b) -> np.ndarray:
        return np.asarray([self.one(a, b) for a in A], dtype=np.float64)

    def pairwise(self, A, B) -> np.ndarray:
        return np.asarray([self.one(a, b) for a, b in zip(A, B)], dtype=np.float64)

    def cross(self, A, B) -> np.ndarray:
        """(n, m) all-pairs distances — the flat join-kernel hot path.
        Numeric subclasses override with a blocked vectorized version."""
        return np.asarray(
            [[self.one(a, b) for b in B] for a in A], dtype=np.float64
        ).reshape(len(A), len(B))


class AbsDiff(Metric):
    name = "absdiff"

    def one(self, a, b) -> float:
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        return float(np.abs(a - b).sum())

    def batch(self, A, b) -> np.ndarray:
        M = _as_matrix(A)
        bv = np.asarray(b, dtype=np.float64).ravel()
        return np.abs(M - bv).sum(axis=1)

    def pairwise(self, A, B) -> np.ndarray:
        return np.abs(_as_matrix(A) - _as_matrix(B)).sum(axis=1)

    def cross(self, A, B) -> np.ndarray:
        return np.abs(_as_matrix(A)[:, None, :] - _as_matrix(B)[None, :, :]).sum(axis=2)


class Euclidean(Metric):
    name = "euclidean"

    def one(self, a, b) -> float:
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        d = a - b
        return float(np.sqrt(np.dot(d, d)))

    def batch(self, A, b) -> np.ndarray:
        M = _as_matrix(A)
        bv = np.asarray(b, dtype=np.float64).ravel()
        d = M - bv
        return np.sqrt(np.einsum("ij,ij->i", d, d))

    def pairwise(self, A, B) -> np.ndarray:
        d = _as_matrix(A) - _as_matrix(B)
        return np.sqrt(np.einsum("ij,ij->i", d, d))

    def cross(self, A, B) -> np.ndarray:
        MA, MB = _as_matrix(A), _as_matrix(B)
        if MA.shape[1] <= 2:
            # direct (a-b)² for the 2-D index path: each IEEE op (sub, mul,
            # add, sqrt) is correctly rounded in the same order any engine
            # computing dx*dx + dy*dy uses, so ranks are bit-reproducible
            # against SQL oracles. The |a|²+|b|²−2ab BLAS form below is ~2×
            # faster at high dim but loses ~ulp(|a|²) absolute accuracy to
            # cancellation — enough to flip near-ties of on-grid coordinates.
            sq = (MA[:, None, 0] - MB[None, :, 0]) ** 2
            for d in range(1, MA.shape[1]):
                sq = sq + (MA[:, None, d] - MB[None, :, d]) ** 2
            return np.sqrt(sq)
        # |a-b|^2 = |a|^2 + |b|^2 - 2ab, clamped for fp safety
        sq = (
            (MA * MA).sum(axis=1)[:, None]
            + (MB * MB).sum(axis=1)[None, :]
            - 2.0 * (MA @ MB.T)
        )
        return np.sqrt(np.maximum(sq, 0.0))


class EuclideanThresholded(Metric):
    name = "euclidean_thresholded"

    def __init__(self, thres: float = 1000.0, factor: float = 3000.0):
        self.thres = thres
        self.factor = factor
        self._l2 = Euclidean()

    def one(self, a, b) -> float:
        return min(self.thres, self.factor * self._l2.one(a, b))

    def batch(self, A, b) -> np.ndarray:
        return np.minimum(self.thres, self.factor * self._l2.batch(A, b))

    def pairwise(self, A, B) -> np.ndarray:
        return np.minimum(self.thres, self.factor * self._l2.pairwise(A, B))

    def cross(self, A, B) -> np.ndarray:
        return np.minimum(self.thres, self.factor * self._l2.cross(A, B))


class Manhattan(Metric):
    name = "manhattan"

    def one(self, a, b) -> float:
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        return float(np.abs(a - b).sum())

    def batch(self, A, b) -> np.ndarray:
        return np.abs(_as_matrix(A) - np.asarray(b, dtype=np.float64).ravel()).sum(axis=1)

    def pairwise(self, A, B) -> np.ndarray:
        return np.abs(_as_matrix(A) - _as_matrix(B)).sum(axis=1)

    def cross(self, A, B) -> np.ndarray:
        return np.abs(_as_matrix(A)[:, None, :] - _as_matrix(B)[None, :, :]).sum(axis=2)


class PNorm(Metric):
    name = "p_norm"

    def __init__(self, p: float = 1.0):
        self.p = p

    def one(self, a, b) -> float:
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        return float(np.power(np.power(np.abs(a - b), self.p).sum(), 1.0 / self.p))

    def batch(self, A, b) -> np.ndarray:
        M = _as_matrix(A)
        bv = np.asarray(b, dtype=np.float64).ravel()
        return np.power(np.power(np.abs(M - bv), self.p).sum(axis=1), 1.0 / self.p)

    def pairwise(self, A, B) -> np.ndarray:
        return np.power(
            np.power(np.abs(_as_matrix(A) - _as_matrix(B)), self.p).sum(axis=1), 1.0 / self.p
        )


class Cosine(Metric):
    """Reference quirk preserved: returns cosine SIMILARITY (Standards.cpp:84-96)."""

    name = "cosine"

    def one(self, a, b) -> float:
        a = np.asarray(a, dtype=np.float64).ravel()
        b = np.asarray(b, dtype=np.float64).ravel()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    def batch(self, A, b) -> np.ndarray:
        M = _as_matrix(A)
        bv = np.asarray(b, dtype=np.float64).ravel()
        num = M @ bv
        den = np.linalg.norm(M, axis=1) * np.linalg.norm(bv)
        return num / den

    def pairwise(self, A, B) -> np.ndarray:
        MA, MB = _as_matrix(A), _as_matrix(B)
        num = np.einsum("ij,ij->i", MA, MB)
        den = np.linalg.norm(MA, axis=1) * np.linalg.norm(MB, axis=1)
        return num / den

    def cross(self, A, B) -> np.ndarray:
        MA, MB = _as_matrix(A), _as_matrix(B)
        num = MA @ MB.T
        den = np.linalg.norm(MA, axis=1)[:, None] * np.linalg.norm(MB, axis=1)[None, :]
        return num / den


class TWED(Metric):
    """Time-Warp Edit Distance over 1-D sequences; time stamps = element indices
    (TWED.cpp:10-76). O(n*m) DP, vectorized across the inner dimension per row."""

    name = "twed"

    def __init__(self, elastic: float = 1.0, penalty: float = 0.0):
        self.elastic = elastic
        self.penalty = penalty

    def one(self, a, b) -> float:
        A = np.asarray(a, dtype=np.float64).ravel()
        B = np.asarray(b, dtype=np.float64).ravel()
        nu, lam = self.elastic, self.penalty
        nA, nB = len(A), len(B)
        # timeA/timeB are just 0..n-1 in the reference's dense path
        D0 = np.empty(nB)
        D0[0] = abs(A[0] - B[0])  # + nu*|timeA[0]-0| == 0
        if nB > 1:
            # first row: D0[j] = D0[j-1] + |B[j-1]-B[j]| + nu + lam  (time delta = 1)
            steps = np.abs(np.diff(B)) + nu + lam
            D0[1:] = D0[0] + np.cumsum(steps)
        i_idx = np.arange(nB)
        for i in range(1, nA):
            Di = np.empty(nB)
            c1_add = abs(A[i - 1] - A[i]) + nu + lam
            Di0 = D0[0] + c1_add
            C1 = D0 + c1_add
            C3 = np.empty(nB)
            C3[0] = np.inf
            C3[1:] = (
                D0[:-1]
                + np.abs(A[i] - B[1:])
                + np.abs(A[i - 1] - B[:-1])
                + nu * (np.abs(i - i_idx[1:]) + np.abs(i - 1 - i_idx[:-1]))
            )
            c2_step = np.empty(nB)
            c2_step[0] = 0.0
            c2_step[1:] = np.abs(np.diff(B)) + nu + lam
            # C2 depends on Di[j-1]: sequential min-scan (numpy loop over j)
            Di[0] = Di0
            m13 = np.minimum(C1, C3)
            for j in range(1, nB):
                Di[j] = min(Di[j - 1] + c2_step[j], m13[j])
            D0 = Di
        return float(D0[nB - 1])

    def one_t(self, A, tA, B, tB) -> float:
        """TWED with explicit timestamps — the general recurrence the
        reference's sparse overload runs on (index, value) pairs
        (TWED.cpp:148-236; the dense path is this with times = 0..n−1)."""
        A = np.asarray(A, dtype=np.float64).ravel()
        B = np.asarray(B, dtype=np.float64).ravel()
        tA = np.asarray(tA, dtype=np.float64).ravel()
        tB = np.asarray(tB, dtype=np.float64).ravel()
        nu, lam = self.elastic, self.penalty
        nA, nB = len(A), len(B)
        D0 = np.empty(nB)
        D0[0] = abs(A[0] - B[0]) + nu * abs(tA[0])
        if nB > 1:
            steps = np.abs(np.diff(B)) + nu * np.diff(tB) + lam
            D0[1:] = D0[0] + np.cumsum(steps)
        c2_step = np.empty(nB)
        c2_step[0] = 0.0
        if nB > 1:
            c2_step[1:] = np.abs(np.diff(B)) + nu * np.diff(tB) + lam
        for i in range(1, nA):
            Di = np.empty(nB)
            c1_add = abs(A[i - 1] - A[i]) + nu * (tA[i] - tA[i - 1]) + lam
            C1 = D0 + c1_add
            C3 = np.empty(nB)
            C3[0] = np.inf
            C3[1:] = (
                D0[:-1]
                + np.abs(A[i] - B[1:])
                + np.abs(A[i - 1] - B[:-1])
                + nu
                * (np.abs(tA[i] - tB[1:]) + np.abs(tA[i - 1] - tB[:-1]))
            )
            Di[0] = D0[0] + c1_add
            m13 = np.minimum(C1, C3)
            for j in range(1, nB):
                Di[j] = min(Di[j - 1] + c2_step[j], m13[j])
            D0 = Di
        return float(D0[nB - 1])

    @staticmethod
    def add_zero_padding(
        indices, values, size: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Port of the reference's sparse-vector preprocessing
        (TWED_details::addZeroPadding, TWED.cpp:84-141): each run of stored
        non-zeros gets one explicit zero immediately before and after it
        (plus index 0 / size−1 sentinels), preserving the reference's exact
        branch quirks (``index != 1`` special case included). Returns
        (times, values) of the padded sparse sequence."""
        out: list[tuple[int, float]] = []
        idx_last = -1
        pairs = list(zip([int(i) for i in indices], [float(v) for v in values]))
        if not pairs:
            out.append((0, 0.0))
            if size - 1 != 0:
                out.append((size - 1, 0.0))
        else:
            for index, value in pairs:
                add_front = index != idx_last + 1
                add_back = (
                    index > idx_last + 1 and index != 1 and index != idx_last + 2
                )
                if add_back:
                    out.append((idx_last + 1, 0.0))
                if add_front:
                    out.append((index - 1, 0.0))
                out.append((index, value))
                idx_last = index
            if idx_last < size - 2:
                out.append((idx_last + 1, 0.0))
            if idx_last < size - 1:
                out.append((size - 1, 0.0))
        t = np.asarray([p[0] for p in out], dtype=np.float64)
        v = np.asarray([p[1] for p in out], dtype=np.float64)
        return t, v

    def one_sparse(
        self,
        idx_a,
        val_a,
        size_a: int,
        idx_b,
        val_b,
        size_b: int,
        is_zero_padded: bool = False,
    ) -> float:
        """The reference's sparse TWED overload (TWED.cpp:148-236): zero-pad
        both compressed vectors (unless already padded) and run the
        timestamped DP on (index, value) pairs — O(nnz_a · nnz_b), not
        O(size_a · size_b)."""
        if is_zero_padded:
            ta, va = np.asarray(idx_a, np.float64), np.asarray(val_a, np.float64)
            tb, vb = np.asarray(idx_b, np.float64), np.asarray(val_b, np.float64)
        else:
            ta, va = self.add_zero_padding(idx_a, val_a, size_a)
            tb, vb = self.add_zero_padding(idx_b, val_b, size_b)
        return self.one_t(va, ta, vb, tb)

    def many(self, S, b) -> np.ndarray:
        """Batched dense TWED: distances from every row of ``S`` (n, m) to the
        anchor ``b`` — the DP loops over (m × |b|) once with every cell op
        vectorized across the n rows (the Arrow-kernel hot path; callers
        group series by length)."""
        S = np.asarray(S, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64).ravel()
        if S.ndim == 1:
            S = S[None, :]
        n, nA = S.shape
        nB = len(b)
        nu, lam = self.elastic, self.penalty
        j_idx = np.arange(nB)
        D0 = np.empty((n, nB))
        D0[:, 0] = np.abs(S[:, 0] - b[0])
        c2_step = np.empty(nB)
        c2_step[0] = 0.0
        if nB > 1:
            steps = np.abs(np.diff(b)) + nu + lam
            c2_step[1:] = steps
            D0[:, 1:] = D0[:, [0]] + np.cumsum(steps)[None, :]
        for i in range(1, nA):
            c1_add = np.abs(S[:, i - 1] - S[:, i]) + nu + lam
            C1 = D0 + c1_add[:, None]
            C3 = np.empty((n, nB))
            C3[:, 0] = np.inf
            C3[:, 1:] = (
                D0[:, :-1]
                + np.abs(S[:, [i]] - b[None, 1:])
                + np.abs(S[:, [i - 1]] - b[None, :-1])
                + (nu * (np.abs(i - j_idx[1:]) + np.abs(i - 1 - j_idx[:-1])))[
                    None, :
                ]
            )
            Di = np.empty((n, nB))
            Di[:, 0] = D0[:, 0] + c1_add
            m13 = np.minimum(C1, C3)
            for j in range(1, nB):
                Di[:, j] = np.minimum(Di[:, j - 1] + c2_step[j], m13[:, j])
            D0 = Di
        return D0[:, -1]


class DTW(Metric):
    """Classic dynamic time warping over 1-D sequences with L1 local cost
    (Sakoe–Chiba 1978, unconstrained window) — the third member of the
    elastic-distance family next to TWED (reference TWED.cpp) and discrete
    Fréchet (operators/trajectory): DTW charges every matched pair and
    allows unlimited stutter, where TWED adds stiffness/edit penalties and
    Fréchet takes the bottleneck max instead of the sum.

    Recurrence: D[i][j] = |A_i − B_j| + min(D[i−1][j], D[i][j−1],
    D[i−1][j−1]); first row/column are running sums (only one path). The
    same-row D[i][j−1] dependency makes the inner loop a sequential
    min-scan (exactly TWED's shape); ``many`` vectorizes every cell op
    across the batch rows and the DuckDB twin (entry_queries.O_DTW_EVENTS)
    unrolls the scan to prefix-sum + prefix-min, the TWED-oracle technique.
    """

    name = "dtw"

    def one(self, a, b) -> float:
        return float(self.many(np.asarray(a, dtype=np.float64)[None, :], b)[0])

    def many(self, S, b) -> np.ndarray:
        """Batched DTW: distances from every row of ``S`` (n, m) to the
        anchor ``b`` — the DP loops over (m × |b|) once with every cell op
        vectorized across the n rows (callers group series by length)."""
        S = np.asarray(S, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64).ravel()
        if S.ndim == 1:
            S = S[None, :]
        n, nA = S.shape
        nB = len(b)
        D0 = np.cumsum(np.abs(S[:, [0]] - b[None, :]), axis=1)  # row 0: all-left
        for i in range(1, nA):
            cost = np.abs(S[:, [i]] - b[None, :])  # (n, nB)
            Di = np.empty((n, nB))
            Di[:, 0] = D0[:, 0] + cost[:, 0]  # col 0: only the up-move
            m = np.minimum(D0[:, 1:], D0[:, :-1])  # min(up, diag), j >= 1
            for j in range(1, nB):
                Di[:, j] = cost[:, j] + np.minimum(Di[:, j - 1], m[:, j - 1])
            D0 = Di
        return D0[:, -1]


class Edit(Metric):
    """Levenshtein (Edit.cpp:11-64). The Spark path uses built-in F.levenshtein;
    this python twin is the oracle for unit tests."""

    name = "edit"

    def one(self, a, b) -> float:
        sa = a if isinstance(a, str) else "".join(map(chr, np.asarray(a, dtype=np.int64)))
        sb = b if isinstance(b, str) else "".join(map(chr, np.asarray(b, dtype=np.int64)))
        if len(sa) < len(sb):
            sa, sb = sb, sa
        prev = np.arange(len(sb) + 1)
        for i, ca in enumerate(sa, 1):
            cur = np.empty(len(sb) + 1, dtype=np.int64)
            cur[0] = i
            sub = prev[:-1] + (np.frombuffer(sb.encode("utf-32-le"), dtype=np.uint32) != ord(ca))
            for j in range(1, len(sb) + 1):
                cur[j] = min(cur[j - 1] + 1, prev[j] + 1, sub[j - 1])
            prev = cur
        return float(prev[-1])


def _ssim_gauss(n: int = 11, quirk_parity: bool = True) -> np.ndarray:
    x = np.arange(n, dtype=np.uint64)
    d = np.uint64(n // 2)
    if quirk_parity:
        # size_t underflow: (x-d) wraps to huge unsigned for x<d -> exp(-huge)=0
        dx = (x - d).astype(np.float64)  # wrapped values become ~1.8e19
        sq = dx * dx
    else:
        dx = x.astype(np.float64) - float(d)
        sq = dx * dx
    g = np.exp(-(sq[:, None] + sq[None, :]) / 2.25)
    return g / g.sum()


class SSIM(Metric):
    name = "ssim"

    def __init__(
        self, dynamic_range: float = 255.0, masking: float = 2.0, quirk_parity: bool = True
    ):
        self.dynamic_range = dynamic_range
        self.masking = masking
        self.window = 11
        self.gauss = _ssim_gauss(self.window, quirk_parity)

    def one(self, a, b) -> float:
        img1 = np.asarray(a, dtype=np.float64)
        img2 = np.asarray(b, dtype=np.float64)
        n = self.window
        C1 = (0.01 * self.dynamic_range) ** 2
        C2 = (0.03 * self.dynamic_range) ** 2
        H = img1.shape[0] - n + 1
        W = img1.shape[1] - n + 1
        if H <= 0 or W <= 0:
            raise ValueError(f"image smaller than SSIM window {n}")
        # sliding windows via stride tricks; weighted moments via tensordot
        from numpy.lib.stride_tricks import sliding_window_view

        w1 = sliding_window_view(img1, (n, n))
        w2 = sliding_window_view(img2, (n, n))
        g = self.gauss
        mu1 = np.tensordot(w1, g, axes=([2, 3], [0, 1]))
        mu2 = np.tensordot(w2, g, axes=([2, 3], [0, 1]))
        s1 = np.tensordot(w1 * w1, g, axes=([2, 3], [0, 1])) - mu1 * mu1
        s2 = np.tensordot(w2 * w2, g, axes=([2, 3], [0, 1])) - mu2 * mu2
        corr = np.tensordot(w1 * w2, g, axes=([2, 3], [0, 1])) - mu1 * mu2
        np.maximum(s1, 0.0, out=s1)
        np.maximum(s2, 0.0, out=s2)
        s12 = np.sqrt(s1 * s2)
        S1 = (2.0 * mu1 * mu2 + C1) / (mu1 * mu1 + mu2 * mu2 + C1)
        S2 = (2.0 * s12 + C2) / (s1 + s2 + C2)
        return float(np.sqrt(np.maximum(2.0 - S1 - S2, 0.0)).sum() / (H * W))


def ground_distance_matrix_of_2dgrid(cols: int, rows: int) -> np.ndarray:
    """Euclidean ground-distance matrix between cells of a rows×cols grid
    (helper analogous to the reference's EMD grid-cost builder,
    n-api/metric_distance/details/EMD.cpp:73-101)."""
    yy, xx = np.divmod(np.arange(rows * cols), cols)
    dx = xx[:, None] - xx[None, :]
    dy = yy[:, None] - yy[None, :]
    return np.sqrt(dx * dx + dy * dy).astype(np.float64)


class EMD(Metric):
    """Earth Mover's Distance between non-negative histograms with the
    reference's emd-hat semantics (Pele & Werman; n-api/metric_distance/
    details/EMD.cpp:678-978): the heavier histogram becomes the supplier P
    (swap + ground-matrix transpose, EMD.cpp:699-726), the lighter side Q is
    satisfied in full by an optimal partial transport where extra supplier
    mass disposes free (the threshold node absorbs it at cost 0,
    EMD.cpp:748-750, 825-835), and the mass difference is charged
    ``extra_mass_penalty`` per unit — default −1 meaning max ground cost
    (EMD.hpp:16, EMD.cpp:762-763, 967-973). The network micro-optimizations
    (pre-flowed zero-cost diagonal, maxC-edge elision) don't change the
    optimum for the metric ground costs the reference uses, so this solves
    the equivalent transportation problem directly with a from-scratch
    successive-shortest-path solver in numpy (no scipy).

    ``ground``: (n, m) cost matrix; default |i−j| (1-D histograms).
    """

    name = "emd"

    def __init__(
        self, ground: np.ndarray | None = None, extra_mass_penalty: float = -1.0
    ):
        self.ground = None if ground is None else np.asarray(ground, dtype=np.float64)
        self.extra_mass_penalty = extra_mass_penalty

    def one(self, a, b) -> float:
        p = np.asarray(a, dtype=np.float64).ravel().copy()
        q = np.asarray(b, dtype=np.float64).ravel().copy()
        C = self.ground
        if C is None:
            idx = np.arange(max(len(p), len(q)), dtype=np.float64)
            C = np.abs(idx[: len(p), None] - idx[None, : len(q)])
        else:
            C = np.asarray(C, dtype=np.float64)[: len(p), : len(q)]
        # supplier swap: ensure P carries the extra mass (EMD.cpp:699-726)
        if q.sum() > p.sum():
            p, q, C = q, p, C.T
        extra = float(p.sum() - q.sum())
        max_c = float(C.max()) if C.size else 0.0
        penalty = max_c if self.extra_mass_penalty == -1 else self.extra_mass_penalty
        if q.sum() <= 0:
            return extra * penalty
        # free disposal of the extra supplier mass == a virtual zero-cost
        # consumer absorbing exactly `extra`; the problem becomes balanced
        q_ext = np.concatenate([q, [extra]])
        C_ext = np.hstack([C, np.zeros((C.shape[0], 1))])
        return _transport_ssp(p, q_ext, C_ext) + extra * penalty


def _transport_ssp(p: np.ndarray, q: np.ndarray, C: np.ndarray) -> float:
    """Balanced transportation via successive shortest augmenting paths
    (Bellman-Ford on the explicit residual graph). Exact for non-negative
    costs; node/edge counts are tiny for the histogram sizes the Arrow
    kernels handle (the reference uses EMD at comparable sizes).

    Node ids: source S=0, suppliers 1..n, consumers n+1..n+m, sink T=n+m+1.
    """
    n, m = C.shape
    S, T = 0, n + m + 1
    n_nodes = n + m + 2
    # edge arrays: to/from, capacity, cost; backward edge is idx ^ 1
    to, cap, cost, head = [], [], [], [[] for _ in range(n_nodes)]

    def add_edge(u: int, v: int, c: float, w: float) -> None:
        head[u].append(len(to))
        to.append(v)
        cap.append(c)
        cost.append(w)
        head[v].append(len(to))
        to.append(u)
        cap.append(0.0)
        cost.append(-w)

    for i in range(n):
        add_edge(S, 1 + i, float(p[i]), 0.0)
    for j in range(m):
        add_edge(1 + n + j, T, float(q[j]), 0.0)
    for i in range(n):
        for j in range(m):
            add_edge(1 + i, 1 + n + j, float("inf"), float(C[i, j]))

    total = 0.0
    eps = 1e-12
    while True:
        dist = np.full(n_nodes, np.inf)
        dist[S] = 0.0
        par_edge = np.full(n_nodes, -1, dtype=np.int64)
        # Bellman-Ford (residual costs can be negative on backward arcs)
        for _ in range(n_nodes):
            changed = False
            for e in range(len(to)):
                if cap[e] > eps:
                    u = to[e ^ 1]
                    if dist[u] + cost[e] < dist[to[e]] - eps:
                        dist[to[e]] = dist[u] + cost[e]
                        par_edge[to[e]] = e
                        changed = True
            if not changed:
                break
        if not np.isfinite(dist[T]):
            break
        # bottleneck along S→T path
        bottleneck = float("inf")
        v = T
        while v != S:
            e = int(par_edge[v])
            bottleneck = min(bottleneck, cap[e])
            v = to[e ^ 1]
        v = T
        while v != S:
            e = int(par_edge[v])
            cap[e] -= bottleneck
            cap[e ^ 1] += bottleneck
            total += bottleneck * cost[e]
            v = to[e ^ 1]
    return float(total)


class Dimension(Metric):
    """The reference's Dimension accessor (n-api/metric_distance/
    dimension.hpp:16-64): a list of per-field accessor callables plus an
    inner metric; ``get_distance(r1, r2)`` extracts the field vector
    ``[acc(r) for acc in accessors]`` from each record (dimension.hpp:36-44)
    and applies the metric to the pair (dimension.hpp:46-58). Spark-side the
    same concept is a ``select()`` projection feeding a metric kernel; this
    class exists for API parity and for custom-record python kernels."""

    name = "dimension"

    def __init__(self, accessors, metric: Metric):
        self.accessors = list(accessors)
        self.metric = metric

    def extract(self, record) -> list:
        return [acc(record) for acc in self.accessors]

    def one(self, a, b) -> float:
        return float(self.metric.one(self.extract(a), self.extract(b)))

    # reference method name (dimension.hpp:46)
    get_distance = one


METRICS: dict[str, type[Metric]] = {
    m.name: m
    for m in (
        AbsDiff,
        Euclidean,
        EuclideanThresholded,
        Manhattan,
        PNorm,
        Cosine,
        TWED,
        DTW,
        Edit,
        SSIM,
        EMD,
    )
}
_ALIASES = {"l2": "euclidean", "l1": "manhattan", "levenshtein": "edit"}


def get_metric(name: str, **kwargs) -> Metric:
    """Metric factory (mirrors metric_factory.hpp:20-23 + the JS enum dispatch)."""
    key = _ALIASES.get(name.lower(), name.lower())
    if key not in METRICS:
        raise KeyError(f"unknown metric {name!r}; known: {sorted(METRICS) + sorted(_ALIASES)}")
    return METRICS[key](**kwargs)


__all__.append("lcs_many")


def lcs_many(seqs: list, anchor: list) -> np.ndarray:
    """Longest-common-subsequence LENGTH of each sequence against the
    anchor (Wagner–Fischer DP) — the order-preserving similarity the
    elastic family (DTW/TWED/Fréchet) can't express for categorical
    event streams. Exact integers throughout; the per-row recurrence
    L[i][j] = max(L[i−1][j], L[i][j−1], match·(L[i−1][j−1]+1)) is
    evaluated as a PREFIX MAX of c[j] = max(L[i−1][j],
    match_j·(L[i−1][j−1]+1)) — the same same-row-dependency unrolling the
    TWED/DTW SQL twins use, so a recursive-CTE twin reproduces every DP
    cell. Vectorized over the anchor axis (np.maximum.accumulate carries
    the sequential j dependency)."""
    b = np.asarray(anchor)
    m = len(b)
    out = np.zeros(len(seqs), dtype=np.int64)
    for r, s in enumerate(seqs):
        a = np.asarray(s)
        if m == 0 or len(a) == 0:
            continue
        prev = np.zeros(m, dtype=np.int64)
        for i in range(len(a)):
            diag = np.concatenate(([0], prev[:-1]))
            c = np.maximum(prev, np.where(a[i] == b, diag + 1, 0))
            prev = np.maximum.accumulate(c)
        out[r] = prev[-1]
    return out
