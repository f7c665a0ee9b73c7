"""Bounding-box label operators: python-twin NMS parity, exact-threshold
semantics, 1:1 matching invariants, and the one-exchange plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.boxes import (
    box_iou_match,
    nms,
    synth_boxes,
    synth_boxes_sql,
)
from metric_search_spark.plans.inspect import count_exchanges

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _nms_py(boxes, pct):
    """Line-for-line greedy NMS twin: boxes = [(box_id,x0,y0,x1,y1,score)]."""
    kept = []
    for b in sorted(boxes, key=lambda t: (-t[5], t[0])):
        ok = True
        for k in kept:
            iw = max(0, min(k[3], b[3]) - max(k[1], b[1]))
            ih = max(0, min(k[4], b[4]) - max(k[2], b[2]))
            inter = iw * ih
            union = (
                (k[3] - k[1]) * (k[4] - k[2])
                + (b[3] - b[1]) * (b[4] - b[2])
                - inter
            )
            if inter * 100 > pct * union:
                ok = False
                break
        if ok:
            kept.append(b)
    return [(k[0], i + 1) for i, k in enumerate(kept)]


def test_fixture_parity_duckdb(spark):
    import duckdb

    got = {
        tuple(r)
        for r in synth_boxes(spark, 30, 6, seed=9).collect()
    }
    want = {
        tuple(int(v) for v in r)
        for r in duckdb.sql(synth_boxes_sql(30, 6, seed=9)).fetchall()
    }
    assert got == want and len(got) == 180


def test_nms_matches_python_twin(spark):
    b = synth_boxes(spark, 40, 10, seed=5)
    rows = b.collect()
    per_img: dict[int, list] = {}
    for r in rows:
        per_img.setdefault(r.image_id, []).append(
            (r.box_id, r.x0, r.y0, r.x1, r.y1, r.score)
        )
    want = {
        (img, bid, rk)
        for img, bs in per_img.items()
        for bid, rk in _nms_py(bs, 45)
    }
    got = {
        (r.image_id, r.box_id, r.keep_rank)
        for r in nms(b, iou_pct=45).collect()
    }
    assert got == want
    # something must actually be suppressed for the test to mean anything
    assert len(got) < len(rows)


def test_nms_threshold_is_strict(spark):
    # two 10×10 boxes overlapping in a 5×10 strip: inter=50, union=150,
    # IoU exactly 1/3 — at pct=33 (100·50 > 33·150) the second box IS
    # suppressed; at pct=34 (5000 > 5100 false) it survives. Pins the
    # strict-> semantics at an exact rational boundary.
    rows = [(0, 0, 0, 0, 10, 10, 100), (0, 1, 5, 0, 15, 10, 50)]
    df = spark.createDataFrame(
        rows, "image_id long, box_id long, x0 long, y0 long, x1 long, "
        "y1 long, score long"
    )
    assert nms(df, iou_pct=33).count() == 1
    kept = nms(df, iou_pct=34)
    assert kept.count() == 2
    assert [r.box_id for r in kept.orderBy("keep_rank").collect()] == [0, 1]


def test_match_is_one_to_one_and_above_threshold(spark):
    b = synth_boxes(spark, 60, 12, seed=3)
    gt = b.where(b.box_id % 12 < 6)
    pred = b.where(b.box_id % 12 >= 6)
    m = box_iou_match(pred, gt, iou_pct=30)
    rows = m.collect()
    assert rows, "fixture must produce matches"
    # 1:1 — no pred and no gt appears twice
    preds = [(r.image_id, r.pred_id) for r in rows]
    gts = [(r.image_id, r.gt_id) for r in rows]
    assert len(set(preds)) == len(preds)
    assert len(set(gts)) == len(gts)
    # every match is strictly above the threshold in micro-IoU terms
    assert all(r.iou_micro > 300_000 for r in rows)
    # pred/gt ids come from the right halves
    assert all(r.pred_id % 12 >= 6 and r.gt_id % 12 < 6 for r in rows)


def test_nms_plan_single_exchange(spark):
    # the whole operator is one groupBy(image_id) shuffle + an in-array
    # fold: any second exchange means a join or window crept in
    b = synth_boxes(spark, 20, 6, seed=1)
    assert count_exchanges(nms(b, iou_pct=45)) == 1
