"""Emerging hotspots: hand-computed Mann–Kendall S on rising/falling/
zero-filled series, bin-edge inclusion, brute python parity, validation."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from metric_search_spark.operators.hotspot import emerging_hotspots
from tests.sparkutil import get_spark

_RES = 3
_T0 = datetime(2024, 1, 1)


def _c(i: int) -> float:
    return (i + 0.5) / (1 << _RES)


def _run(events, bins=4):
    """events: list of (cell, bin_hint) with bin_hint in 0..bins-1; ts is
    placed mid-bin over a [0, bins) hour window."""
    spark = get_spark()
    rows = [
        (_T0 + timedelta(minutes=60 * b + 30), _c(cx), _c(cy))
        for (cx, cy), b in events
    ]
    # pin the extent with sentinel events at both ends in a parked cell
    rows.append((_T0, _c(7), _c(7)))
    rows.append((_T0 + timedelta(minutes=60 * bins - 1), _c(7), _c(7)))
    df = spark.createDataFrame(rows, "ts timestamp, x double, y double")
    out = emerging_hotspots(df, _RES, bins).collect()
    from metric_search_spark.cells import interleave_bits
    import numpy as np

    def tid(cx, cy):
        return (_RES << 56) | int(interleave_bits(np.array([cx]), np.array([cy]))[0])

    inv = {tid(cx, cy): (cx, cy) for cx in range(8) for cy in range(8)}
    return {
        inv[r["tile"]]: (r["s_stat"], r["cnt_total"], r["cnt_last"]) for r in out
    }


def test_rising_series():
    # counts 1,2,3,4 over 4 bins: all 6 pairs positive
    ev = [((2, 2), b) for b in range(4) for _ in range(b + 1)]
    out = _run(ev)
    assert out[(2, 2)] == (6, 10, 4)


def test_falling_series():
    ev = [((3, 1), b) for b in range(4) for _ in range(4 - b)]
    out = _run(ev)
    assert out[(3, 1)] == (-6, 10, 1)


def test_zero_fill_matters():
    # events only in the LAST bin: series 0,0,0,k -> S = 3 (not 0 from a
    # length-1 series)
    ev = [((5, 5), 3) for _ in range(4)]
    out = _run(ev)
    assert out[(5, 5)] == (3, 4, 4)


def test_extent_sentinels_and_edges():
    # the sentinel cell (7,7) has one event in bin 0 and one in the last
    # bin: series 1,0,0,1 -> pairs: (1,0)x2 neg... compute: bins
    # [1,0,0,1]: pairs (0,1)-1 (0,2)-1 (0,3)0 (1,2)0 (1,3)+1 (2,3)+1 -> 0
    out = _run([])
    assert out[(7, 7)] == (0, 2, 1)


def _brute(series):
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = series[j] - series[i]
            s += (d > 0) - (d < 0)
    return s


def test_brute_parity_pseudorandom():
    state = 17

    def nxt(m):
        nonlocal state
        state = (state * 48271) % 2147483647
        return state % m

    bins = 6
    ev = []
    cells = [(nxt(8), nxt(8)) for _ in range(5)]
    series = {c: [0] * bins for c in cells}
    for _ in range(300):
        c = cells[nxt(len(cells))]
        b = nxt(bins)
        ev.append((c, b))
        series[c][b] += 1
    out = _run(ev, bins=bins)
    for c, ser in series.items():
        extra = [1 if c == (7, 7) else 0, *[0] * (bins - 2), 1 if c == (7, 7) else 0]
        want_ser = [a + e for a, e in zip(ser, extra)]
        assert out[c] == (_brute(want_ser), sum(want_ser), want_ser[-1]), c


def test_validation():
    spark = get_spark()
    df = spark.createDataFrame([(_T0, 0.5, 0.5)], "ts timestamp, x double, y double")
    with pytest.raises(ValueError, match="resolution"):
        emerging_hotspots(df, 0, 4)
    with pytest.raises(ValueError, match="bins"):
        emerging_hotspots(df, 3, 1)
