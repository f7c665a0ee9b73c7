"""operators/regress.linreg — exact-integer per-group OLS.

Reference anchor: the reference engine's aggregate surface
(SURVEY.md §2.4) reduces metric columns with deterministic exact
arithmetic; linreg extends that family with the closed-form trend fit a
metric-over-time pipeline needs. Determinism contract: the five
sufficient statistics are exact int64 sums of 2^s-scaled coordinates, so
the fit is invariant under any partitioning/summation order.
"""

from __future__ import annotations

import numpy as np

from metric_search_spark.operators.regress import linreg
from tests.sparkutil import get_spark


def _fit_rows(rows, **kw):
    spark = get_spark()
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = linreg(df, "x", "y", group_cols=["g"], **kw)
    return {r["g"]: (r["n"], r["slope"], r["intercept"]) for r in out.collect()}


def test_exact_line_recovered():
    # y = 3x + 5 exactly, x integer-valued: scaling by 2^16 is lossless so
    # the closed form recovers slope/intercept to float exactness
    rows = [("a", float(x), 3.0 * x + 5.0) for x in range(10)]
    got = _fit_rows(rows)
    n, slope, intercept = got["a"]
    assert n == 10
    assert abs(slope - 3.0) < 1e-12
    # intercept is reported in scaled-y units (2^16)
    assert abs(intercept / 65536.0 - 5.0) < 1e-9


def test_matches_numpy_polyfit_on_scaled_ints():
    rng = np.random.default_rng(5)
    xs = rng.uniform(0, 30, size=200)
    ys = 1.7 * xs + rng.normal(0, 2.0, size=200)
    rows = [("g", float(x), float(y)) for x, y in zip(xs, ys)]
    got = _fit_rows(rows)
    _, slope, intercept = got["g"]
    ix = np.floor(xs * 65536.0)
    iy = np.floor(ys * 65536.0)
    ref_slope, ref_icept = np.polyfit(ix, iy, 1)
    assert abs(slope - ref_slope) < 1e-9
    assert abs(intercept - ref_icept) < 1e-6 * max(1.0, abs(ref_icept))


def test_partitioning_invariance():
    # exact integer sums ⇒ identical fit under any partitioning
    spark = get_spark()
    rng = np.random.default_rng(11)
    rows = [
        (f"g{i % 3}", float(x), float(0.5 * x + rng.normal()))
        for i, x in enumerate(rng.uniform(0, 10, size=300))
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = {r["g"]: (r["slope"], r["intercept"]) for r in linreg(df, "x", "y", group_cols=["g"]).collect()}
    b = {
        r["g"]: (r["slope"], r["intercept"])
        for r in linreg(df.repartition(7, "x"), "x", "y", group_cols=["g"]).collect()
    }
    assert a == b  # bit-identical, not approximately equal


def test_degenerate_groups_dropped():
    rows = [("single", 1.0, 2.0), ("flat", 4.0, 1.0), ("flat", 4.0, 9.0)]
    got = _fit_rows(rows)
    assert "single" not in got  # n < 2
    assert "flat" not in got  # zero x-variance


# ------------------------------------------------------------------- acf


def _acf_numpy(xs, k):
    x = np.floor(np.asarray(xs) * 4096.0)
    n = len(x)
    m = x.sum() / n
    num = ((x[: n - k] - m) * (x[k:] - m)).sum()
    den = ((x - m) ** 2).sum()
    return num / den


def test_acf_matches_numpy():
    from metric_search_spark.operators.regress import acf

    spark = get_spark()
    rng = np.random.default_rng(3)
    # AR(1)-ish series: positive lag-1 autocorrelation by construction
    vals = [50.0]
    for _ in range(399):
        vals.append(0.8 * vals[-1] + 0.2 * 50.0 + rng.normal(0, 5.0))
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = acf(df, "v", group_cols=["g"], order_cols=["i"], max_lag=3)
    got = {r["lag"]: r["r"] for r in out.collect()}
    for k in (1, 2, 3):
        assert abs(got[k] - _acf_numpy(vals, k)) < 1e-9
    assert got[1] > 0.5  # the AR structure is actually detected


def test_acf_partitioning_invariance():
    from metric_search_spark.operators.regress import acf

    spark = get_spark()
    rng = np.random.default_rng(4)
    rows = [
        (f"g{i % 2}", i, float(v))
        for i, v in enumerate(rng.uniform(0, 100, size=300))
    ]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    a = sorted(map(tuple, acf(df, "v", group_cols=["g"], order_cols=["i"]).collect()))
    b = sorted(
        map(
            tuple,
            acf(
                df.repartition(11), "v", group_cols=["g"], order_cols=["i"]
            ).collect(),
        )
    )
    assert a == b


def test_mann_kendall_golden():
    """Hand series: strictly increasing -> S = n(n-1)/2, var_num has no tie
    correction; strictly decreasing mirrors to -S; constant series -> S=0,
    var fully consumed by the tie term, z = 0."""
    from metric_search_spark.operators.regress import mann_kendall

    spark = get_spark()
    rows = []
    for i in range(6):  # user 0: increasing 0..5
        rows.append((0, i, float(i)))
    for i in range(6):  # user 1: decreasing
        rows.append((1, i, float(-i)))
    for i in range(6):  # user 2: constant
        rows.append((2, i, 7.0))
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    got = {
        r.user_id: (r.n, r.s_stat, r.var_num, r.z)
        for r in mann_kendall(df, limit=24).collect()
    }
    n = 6
    vn = n * (n - 1) * (2 * n + 5)  # no ties
    import math

    z_up = round((15 - 1) / math.sqrt(vn / 18.0), 12)
    assert got[0] == (6, 15, vn, z_up)
    assert got[1] == (6, -15, vn, -z_up)
    # constant: every element ties with all 6 -> T = 6*5*17 = vn -> var 0
    assert got[2] == (6, 0, vn - 6 * 5 * 17, 0.0)
    assert got[2][2] == 0


def test_mann_kendall_scipy_free_reference():
    """Random-ish deterministic series vs a direct python recomputation,
    including the tie correction and the order/limit clipping."""
    from metric_search_spark.operators.regress import mann_kendall

    spark = get_spark()
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    rows = [(0, i, v) for i, v in enumerate(vals)]
    # rows arrive shuffled; order_col must restore series order
    rows = rows[::-1]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    limit = 8
    ser = vals[:limit]
    n = len(ser)
    s = sum(
        (ser[j] > ser[i]) - (ser[j] < ser[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    t_sum = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ser).values())
    vn = n * (n - 1) * (2 * n + 5) - t_sum
    import math

    z = round((s - 1) / math.sqrt(vn / 18.0), 12) if s > 0 else 0.0
    got = mann_kendall(df, limit=limit).collect()[0]
    assert (got.n, got.s_stat, got.var_num, got.z) == (n, s, vn, z)


def test_spearman_hand_values():
    from metric_search_spark.operators.regress import spearman

    spark = get_spark()

    rows = []
    # user 0: perfectly increasing -> rho = 1
    for i, v in enumerate([1.0, 2.0, 5.0, 9.0]):
        rows.append((0, i, v))
    # user 1: perfectly decreasing -> rho = -1
    for i, v in enumerate([9.0, 5.0, 2.0, 1.0]):
        rows.append((1, i, v))
    # user 2: tie case [1, 2, 2, 3]: y avg-ranks (1, 2.5, 2.5, 4),
    # Pearson([1,2,3,4], .) = 18/sqrt(20*18) = 3/sqrt(10)
    for i, v in enumerate([1.0, 2.0, 2.0, 3.0]):
        rows.append((2, i, v))
    # user 3: constant -> zero rank variance -> rho NULL
    for i in range(4):
        rows.append((3, i, 7.0))
    # user 4: too short (n=2) -> dropped
    rows += [(4, 0, 1.0), (4, 1, 2.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = {r.user_id: r for r in spearman(df).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0].rho == 1.0 and out[1].rho == -1.0
    assert out[2].rho == round(18 / (20 * 18) ** 0.5, 12)
    assert out[2].num == 72  # 4x the rank-scale numerator (both ranks doubled)
    assert out[3].rho is None
    assert out[0].n == 4


def test_cusum_changepoint_hand_values():
    from metric_search_spark.operators.regress import cusum_changepoint

    spark = get_spark()
    rows = []
    # user 0: clean step 1,1,1,9,9,9 -> split at t=3; S3=3, S6=30 (scaled
    # by 1e6): D = |6*3 - 3*30| * 1e6 = 72e6, gap negative (early lower)
    for i, v in enumerate([1.0, 1.0, 1.0, 9.0, 9.0, 9.0]):
        rows.append((0, i, v))
    # user 1: constant -> all D = 0, tie broken to t = 1
    for i in range(4):
        rows.append((1, i, 5.0))
    # user 2: n = 1 -> dropped
    rows.append((2, 0, 3.0))
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = {r.user_id: r for r in cusum_changepoint(df).collect()}
    assert set(out) == {0, 1}
    assert (out[0].t_star, out[0].d_star) == (3, 72_000_000)
    assert out[0].gap_signed == -72_000_000
    assert (out[1].t_star, out[1].d_star, out[1].gap_signed) == (1, 0, 0)


def test_ks_two_sample_hand_values():
    from metric_search_spark.operators.regress import ks_two_sample

    spark = get_spark()
    rows = [
        # user 0: a=[1,2,3] vs b=[2.5,4] -> D = |F_a - F_b| max = 2/3 at v=2
        (0, "view", 1.0), (0, "view", 2.0), (0, "view", 3.0),
        (0, "click", 2.5), (0, "click", 4.0),
        # user 1: identical samples -> D = 0 (ties cancel inside the group)
        (1, "view", 5.0), (1, "click", 5.0),
        # user 2: only views -> dropped
        (2, "view", 1.0),
        # other event types must be ignored
        (0, "error", 999.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = {r.user_id: r for r in ks_two_sample(df, "view", "click").collect()}
    assert set(out) == {0, 1}
    assert (out[0].n_a, out[0].n_b, out[0].d_int) == (3, 2, 4)
    assert out[0].d_micro == 4 * 1_000_000 // 6
    assert (out[1].d_int, out[1].d_micro) == (0, 0)
