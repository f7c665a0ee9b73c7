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


def test_box_raster_hand_computed(spark):
    from metric_search_spark.operators.boxes import box_raster

    # one image, two boxes on a 16-px lattice:
    #   A = [4,4)..[20,12): spans cells (0,0) and (1,0)
    #   B = [12,0)..[36,20): spans cells (0..2) × (0..1)
    rows = [(7, 0, 4, 4, 20, 12, 99), (7, 1, 12, 0, 36, 20, 50)]
    df = spark.createDataFrame(
        rows, "image_id long, box_id long, x0 long, y0 long, x1 long, y1 long, score long"
    )
    got = {
        (r.cell_x, r.cell_y): (r.n_boxes, r.covered_px, r.tile)
        for r in box_raster(df, cell=16).collect()
    }
    # cell (0,0): A gives (16-4)*(12-4)=96; B gives (16-12)*(16-0)=64
    assert got[(0, 0)] == (2, 160, 0)
    # cell (1,0): A gives (20-16)*8=32; B gives 16*16=256 → 288; morton(1,0)=1
    assert got[(1, 0)] == (2, 288, 1)
    # cell (2,0): B only, (36-32)*16=64; morton(2,0)=4
    assert got[(2, 0)] == (1, 64, 4)
    # cell (0,1): B only, (16-12)*(20-16)=16; morton(0,1)=2
    assert got[(0, 1)] == (1, 16, 2)
    # cell (1,1): B only, 16*4=64; morton(1,1)=3
    assert got[(1, 1)] == (1, 64, 3)
    # cell (2,1): B only, 4*4=16; morton(2,1)=6
    assert got[(2, 1)] == (1, 16, 6)
    assert len(got) == 6


def test_box_raster_plan_single_exchange(spark):
    from metric_search_spark.operators.boxes import box_raster

    # explode is pipeline-local; the only shuffle is the (image_id, cell)
    # aggregate — a second exchange means a join or window crept in
    b = synth_boxes(spark, 20, 6, seed=1)
    assert count_exchanges(box_raster(b, cell=16)) == 1


def test_box_raster_mass_conservation(spark):
    from metric_search_spark.operators.boxes import box_raster

    # summing covered_px over all cells of an image must equal the sum of
    # its box areas exactly (the raster partitions each box)
    b = synth_boxes(spark, 30, 8, seed=3)
    area = b.groupBy("image_id").agg(
        F.sum((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))).alias("a")
    )
    mass = (
        box_raster(b, cell=16)
        .groupBy("image_id")
        .agg(F.sum("covered_px").alias("m"))
    )
    bad = area.join(mass, "image_id").where(F.col("a") != F.col("m")).count()
    assert bad == 0
