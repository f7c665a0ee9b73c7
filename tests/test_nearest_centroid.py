"""operators/cluster.nearest_centroid — Rocchio labeling QA.

Pins: hand-computable assignment on a tiny separable fixture, the
mislabeled-row detection use case, exact-integer partitioning invariance,
and the broadcast plan shape.
"""

from __future__ import annotations

from metric_search_spark.operators.cluster import nearest_centroid
from tests.sparkutil import get_spark


def _df():
    spark = get_spark()
    rows = [
        # label 0 clusters near (0, 0); label 1 near (1, 1)
        (0, [0.01, 0.02], 0),
        (1, [0.03, 0.01], 0),
        (2, [0.98, 0.99], 1),
        (3, [0.97, 1.01], 1),
        # mislabeled: sits with cluster 1 but tagged 0
        (4, [0.99, 0.98], 0),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_assignment_and_mislabel_detection():
    out = {
        r["vec_id"]: (r["label"], r["pred"])
        for r in nearest_centroid(_df()).collect()
    }
    # the mislabeled row pulls centroid 0 toward (0.34, 0.34) — still far
    # from (1, 1), so row 4 is predicted 1 while labeled 0
    assert out[4] == (0, 1)
    assert out[0] == (0, 0) and out[1] == (0, 0)
    assert out[2] == (1, 1) and out[3] == (1, 1)


def test_partitioning_invariance_and_broadcast_plan():
    df = _df()
    a = sorted(map(tuple, nearest_centroid(df).collect()))
    b = sorted(map(tuple, nearest_centroid(df.repartition(5)).collect()))
    assert a == b
    plan = (
        nearest_centroid(df, method="relational")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # centroids never shuffle the points


def test_arrow_and_relational_paths_bit_identical():
    import numpy as np

    spark = get_spark()
    rng = np.random.default_rng(31)
    rows = [
        (i, [float(v) for v in rng.uniform(-0.6, 0.6, 16)], int(i % 7))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    a = sorted(map(tuple, nearest_centroid(df, method="arrow").collect()))
    r = sorted(map(tuple, nearest_centroid(df, method="relational").collect()))
    assert a == r  # same exact integers ⇒ bit-identical dist and argmin


def test_arrow_envelope_degrades_to_relational():
    # scale_bits=40 blows the 2^28 arrow diff bound DRIVER-SIDE: the call
    # must degrade to the decimal path and still return correct argmins
    # (the decimal path squares in decimal, so diff² beyond int64 is fine)
    df = _df()
    out = {
        r["vec_id"]: r["pred"]
        for r in nearest_centroid(df, method="arrow", scale_bits=40).collect()
    }
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1}
