"""OD flow matrix: hand-computed flows on a tiny two-user trajectory,
self-loop (dwell) semantics, flow conservation."""

from __future__ import annotations

from metric_search_spark.operators.transitions import od_matrix
from tests.sparkutil import get_spark

# res-1 grid (2x2): quadrant tiles. Morton prefix: (cx,cy) -> cx | cy<<1.
_Q = {(0, 0): (1 << 56) | 0, (1, 0): (1 << 56) | 1,
      (0, 1): (1 << 56) | 2, (1, 1): (1 << 56) | 3}

# user 1 walks SW -> SE -> SE -> NE (one dwell in SE);
# user 2 walks NW -> SW
_ROWS = [
    (1, 1, 0.1, 0.1),
    (1, 2, 0.9, 0.2),
    (1, 3, 0.8, 0.3),
    (1, 4, 0.7, 0.9),
    (2, 1, 0.2, 0.8),
    (2, 2, 0.3, 0.3),
]


def _df(spark):
    return spark.createDataFrame(
        _ROWS, "user_id long, event_id long, x double, y double"
    )


def test_hand_computed_flows():
    spark = get_spark()
    out = {
        (r["o_tile"], r["d_tile"]): r["flow"]
        for r in od_matrix(_df(spark), 1).collect()
    }
    assert out == {
        (_Q[(0, 0)], _Q[(1, 0)]): 1,   # user 1: SW -> SE
        (_Q[(1, 0)], _Q[(1, 0)]): 1,   # user 1 dwell in SE
        (_Q[(1, 0)], _Q[(1, 1)]): 1,   # user 1: SE -> NE
        (_Q[(0, 1)], _Q[(0, 0)]): 1,   # user 2: NW -> SW
    }


def test_flow_conservation():
    """Σ flows = Σ_users (len(trajectory) - 1): no hop lost or duplicated."""
    spark = get_spark()
    total = sum(r["flow"] for r in od_matrix(_df(spark), 1).collect())
    assert total == (4 - 1) + (2 - 1)
