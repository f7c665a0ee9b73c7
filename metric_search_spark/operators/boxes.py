"""Bounding-box label operators for vision training-data pipelines.

Detection corpora ship (image, boxes) pairs; before training, pipelines
(a) suppress duplicate/overlapping proposals per image (greedy NMS — the
exact algorithm every detector's post-process runs, Felzenszwalb et al.,
PAMI 2010) and (b) match predicted boxes to ground truth at an IoU
threshold to score label quality (the PASCAL-VOC / COCO matching rule).
Both reduce to per-image work over a BOUNDED box set (detection labels
cap at O(100) boxes/image), which fixes the scale shape: one shuffle
keyed by image_id, then pure in-array Column folds — no Python in the
hot path, no cross-image data movement, embarrassingly parallel over
10⁹ images.

Exactness: boxes are integer-pixel, half-open [x0,x1)×[y0,y1), so
intersection/union areas are exact BIGINTs and every IoU-vs-threshold
test is the integer comparison ``inter·100 > pct·union`` — bit-identical
in Spark and any ANSI engine, no float IoU anywhere. Greedy NMS is a
left fold over the (score DESC, box_id ASC)-sorted array: a box is kept
iff it does not overlap any PREVIOUSLY KEPT box above the threshold
(suppression is strict ``>``: an IoU of exactly pct/100 survives).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_search_spark.operators.sampling import hash_col, sample_hash_sql

__all__ = [
    "synth_boxes",
    "synth_boxes_sql",
    "nms",
    "box_iou_match",
    "box_raster",
]

# fixture geometry: 128×128 canvas; seed boxes 8..39 px a side anchored in
# [0, 96)²; the second half of each image's boxes are ±jitter clones of the
# first half so high-IoU pairs are GUARANTEED present (uniform boxes alone
# rarely exceed IoU 0.45) — the clones are what NMS is for
_CANVAS = 128
_SEED_XY, _SEED_WH = 96, 32


def _box_cols(bid: Column, seed: int) -> tuple[Column, ...]:
    """Deterministic (x0, y0, w, h, score) for one box id — five independent
    MINSTD streams (sampling.hash_col), exact-integer reproducible in SQL
    (synth_boxes_sql)."""
    hx = hash_col(bid, seed + 1)
    hy = hash_col(bid, seed + 2)
    hw = hash_col(bid, seed + 3)
    hh = hash_col(bid, seed + 4)
    hs = hash_col(bid, seed + 5)
    return (
        hx % _SEED_XY,
        hy % _SEED_XY,
        hw % _SEED_WH + 8,
        hh % _SEED_WH + 8,
        hs % 1_000_000,
    )


def synth_boxes(
    spark: SparkSession, n_images: int, per_image: int, *, seed: int = 0
) -> DataFrame:
    """Deterministic synthetic detection labels: ``per_image`` boxes for
    each of ``n_images`` images (per_image must be even). Box j < half is a
    hash-placed seed box; box j >= half is a jittered clone of box j−half
    (position ±4, size −3..+4, independent score) clamped to the canvas —
    so every image carries near-duplicate high-IoU pairs. Pure Column
    algebra over spark.range: no data files, no Python, and
    ``synth_boxes_sql`` reproduces the exact rows in DuckDB.

    Returns (image_id, box_id, x0, y0, x1, y1, score) — integer pixels,
    half-open extents, x1 ≤ 132 < 2³¹ so ALL downstream area arithmetic
    stays far inside exact BIGINT."""
    if per_image % 2:
        raise ValueError(f"per_image {per_image} must be even")
    half = per_image // 2
    b = spark.range(n_images * per_image).select(
        (F.col("id") / per_image).cast("long").alias("image_id"),
        F.col("id").alias("box_id"),
        (F.col("id") % per_image).alias("j"),
    )
    # the seed box this row derives from: itself for j < half, j − half's
    # box id otherwise (clone rows re-hash their PARENT's geometry streams)
    parent = F.when(
        F.col("j") < half, F.col("box_id")
    ).otherwise(F.col("box_id") - half)
    x0, y0, w, h, score_seed = _box_cols(parent, seed)
    # clones jitter position by hash%9−4 ∈ [−4,4] and size by hash%8−3 ∈
    # [−3,4]; seeds take zero jitter. clamp keeps x0 ≥ 0 and w ≥ 5
    jx = F.when(F.col("j") < half, F.lit(0)).otherwise(
        hash_col(F.col("box_id"), seed + 6) % 9 - 4
    )
    jy = F.when(F.col("j") < half, F.lit(0)).otherwise(
        hash_col(F.col("box_id"), seed + 7) % 9 - 4
    )
    jw = F.when(F.col("j") < half, F.lit(0)).otherwise(
        hash_col(F.col("box_id"), seed + 8) % 8 - 3
    )
    score = hash_col(F.col("box_id"), seed + 5) % 1_000_000
    x0c = F.greatest(x0 + jx, F.lit(0))
    y0c = F.greatest(y0 + jy, F.lit(0))
    wc = F.greatest(w + jw, F.lit(5))
    return b.select(
        "image_id",
        "box_id",
        x0c.cast("long").alias("x0"),
        y0c.cast("long").alias("y0"),
        (x0c + wc).cast("long").alias("x1"),
        (y0c + h + jw).cast("long").alias("y1"),
        F.when(F.col("j") < half, score_seed)
        .otherwise(score)
        .cast("long")
        .alias("score"),
    )


def synth_boxes_sql(n_images: int, per_image: int, *, seed: int = 0) -> str:
    """DuckDB twin of synth_boxes: identical rows from identical integer
    hash streams (sampling.sample_hash_sql), as a SELECT over range()."""
    half = per_image // 2
    parent = f"(CASE WHEN j < {half} THEN box_id ELSE box_id - {half} END)"

    def hs(expr: str, s: int) -> str:
        return sample_hash_sql(expr, seed + s)

    x0 = f"({hs(parent, 1)}) % {_SEED_XY}"
    y0 = f"({hs(parent, 2)}) % {_SEED_XY}"
    w = f"({hs(parent, 3)}) % {_SEED_WH} + 8"
    h = f"({hs(parent, 4)}) % {_SEED_WH} + 8"
    sc_seed = f"({hs(parent, 5)}) % 1000000"
    sc_own = f"({hs('box_id', 5)}) % 1000000"
    jx = f"(CASE WHEN j < {half} THEN 0 ELSE ({hs('box_id', 6)}) % 9 - 4 END)"
    jy = f"(CASE WHEN j < {half} THEN 0 ELSE ({hs('box_id', 7)}) % 9 - 4 END)"
    jw = f"(CASE WHEN j < {half} THEN 0 ELSE ({hs('box_id', 8)}) % 8 - 3 END)"
    return f"""
SELECT image_id, box_id,
       greatest(({x0}) + ({jx}), 0) AS x0,
       greatest(({y0}) + ({jy}), 0) AS y0,
       greatest(({x0}) + ({jx}), 0) + greatest(({w}) + ({jw}), 5) AS x1,
       greatest(({y0}) + ({jy}), 0) + ({h}) + ({jw}) AS y1,
       CASE WHEN j < {half} THEN {sc_seed} ELSE {sc_own} END AS score
FROM (
  SELECT range // {per_image} AS image_id, range AS box_id,
         range % {per_image} AS j
  FROM range(0, {n_images * per_image})
)
"""


def _inter(a: str, b: str) -> Column:
    """Exact intersection area of two box structs (columns named
    x0/y0/x1/y1), half-open semantics: 0 when disjoint."""
    iw = F.greatest(
        F.least(F.col(f"{a}.x1"), F.col(f"{b}.x1"))
        - F.greatest(F.col(f"{a}.x0"), F.col(f"{b}.x0")),
        F.lit(0),
    )
    ih = F.greatest(
        F.least(F.col(f"{a}.y1"), F.col(f"{b}.y1"))
        - F.greatest(F.col(f"{a}.y0"), F.col(f"{b}.y0")),
        F.lit(0),
    )
    return iw * ih


def _area(a: str) -> Column:
    return (F.col(f"{a}.x1") - F.col(f"{a}.x0")) * (
        F.col(f"{a}.y1") - F.col(f"{a}.y0")
    )


_BOX_T = "array<struct<box_id:bigint,x0:bigint,y0:bigint,x1:bigint,y1:bigint,score:bigint>>"


def nms(
    boxes: DataFrame,
    *,
    iou_pct: int = 45,
    group_col: str = "image_id",
) -> DataFrame:
    """Greedy non-maximum suppression per image, entirely in Column
    algebra: sort the image's boxes by (score DESC, box_id ASC), left-fold
    the sorted array keeping a box iff its exact-integer IoU with EVERY
    previously kept box satisfies inter·100 ≤ iou_pct·union (suppression
    strictly above the threshold — the standard detector post-process and
    the duplicate-label filter of a detection-corpus pipeline).

    Plan: ONE shuffle (groupBy image_id → collect_list) then a per-row
    aggregate fold over the bounded per-image array — O(B²) integer ops
    per image, B = boxes/image (labels cap at O(100)); zero Python, zero
    joins, no cross-image traffic — the plan is one exchange at any corpus
    size. Returns kept boxes as (image_id, box_id, x0, y0, x1, y1, score,
    keep_rank) with keep_rank the 1-based keep order (= score order)."""
    srt = F.array_sort(
        F.collect_list(
            F.struct("box_id", "x0", "y0", "x1", "y1", "score")
        ),
        lambda a, b: F.when(a["score"] > b["score"], -1)
        .when(a["score"] < b["score"], 1)
        .when(a["box_id"] < b["box_id"], -1)
        .otherwise(1),
    )
    g = boxes.groupBy(group_col).agg(srt.alias("bs"))

    def suppressed(kept: Column, b: Column) -> Column:
        # any kept box with inter*100 > pct*union suppresses b
        def overlaps(k: Column) -> Column:
            iw = F.greatest(
                F.least(k["x1"], b["x1"]) - F.greatest(k["x0"], b["x0"]),
                F.lit(0),
            )
            ih = F.greatest(
                F.least(k["y1"], b["y1"]) - F.greatest(k["y0"], b["y0"]),
                F.lit(0),
            )
            inter = iw * ih
            union = (
                (k["x1"] - k["x0"]) * (k["y1"] - k["y0"])
                + (b["x1"] - b["x0"]) * (b["y1"] - b["y0"])
                - inter
            )
            return inter * 100 > F.lit(iou_pct) * union

        return F.exists(kept, overlaps)

    kept = F.aggregate(
        F.col("bs"),
        F.array().cast(_BOX_T),
        lambda acc, b: F.when(
            suppressed(acc, b), acc
        ).otherwise(F.concat(acc, F.array(b))),
    )
    out = g.select(group_col, F.posexplode(kept).alias("pos", "k"))
    return out.select(
        group_col,
        F.col("k.box_id").alias("box_id"),
        F.col("k.x0").alias("x0"),
        F.col("k.y0").alias("y0"),
        F.col("k.x1").alias("x1"),
        F.col("k.y1").alias("y1"),
        F.col("k.score").alias("score"),
        (F.col("pos") + 1).cast("long").alias("keep_rank"),
    )


def box_iou_match(
    pred: DataFrame,
    gt: DataFrame,
    *,
    iou_pct: int = 45,
    group_col: str = "image_id",
) -> DataFrame:
    """PASCAL-VOC-style greedy detection matching: every (pred, gt) pair in
    the same image with exact-integer IoU STRICTLY above iou_pct/100 is a
    candidate; each prediction claims its best ground-truth box (max
    inter·10⁶//union micro-IoU, ties to the smaller gt_id), then each
    ground truth keeps only its highest-scoring claimant (ties to the
    smaller pred_id) — so matches are 1:1, the precision/recall join of a
    label-QA pipeline.

    Plan: image_id equi-join (the per-image box sets are bounded, so the
    pair blow-up is B_p·B_g per image, a constant), then two max_by
    aggregates — three bounded shuffles, no window over the corpus, no
    driver collection. iou_micro = inter·10⁶ // union is an EXACT integer
    (floor division) so the hash compares cross-engine.

    Returns (image_id, pred_id, gt_id, iou_micro, pred_score)."""
    p = pred.select(
        F.col(group_col),
        F.col("box_id").alias("pred_id"),
        F.col("x0").alias("px0"),
        F.col("y0").alias("py0"),
        F.col("x1").alias("px1"),
        F.col("y1").alias("py1"),
        F.col("score").alias("pred_score"),
    )
    gtd = gt.select(
        F.col(group_col),
        F.col("box_id").alias("gt_id"),
        F.col("x0").alias("gx0"),
        F.col("y0").alias("gy0"),
        F.col("x1").alias("gx1"),
        F.col("y1").alias("gy1"),
    )
    j = p.join(gtd, group_col)
    iw = F.greatest(
        F.least("px1", "gx1") - F.greatest("px0", "gx0"), F.lit(0)
    )
    ih = F.greatest(
        F.least("py1", "gy1") - F.greatest("py0", "gy0"), F.lit(0)
    )
    inter = iw * ih
    union = (
        (F.col("px1") - F.col("px0")) * (F.col("py1") - F.col("py0"))
        + (F.col("gx1") - F.col("gx0")) * (F.col("gy1") - F.col("gy0"))
        - inter
    )
    cand = j.where(inter * 100 > F.lit(iou_pct) * union).select(
        group_col,
        "pred_id",
        "gt_id",
        F.floor(inter * 1_000_000 / union).cast("long").alias("iou_micro"),
        "pred_score",
    )
    # best gt per pred: max (iou_micro, −gt_id); struct max_by via max(struct)
    best_gt = cand.groupBy(group_col, "pred_id").agg(
        F.max(
            F.struct(
                F.col("iou_micro"), (-F.col("gt_id")).alias("ng"),
                F.col("gt_id"), F.col("pred_score"),
            )
        ).alias("m")
    )
    claims = best_gt.select(
        group_col,
        "pred_id",
        F.col("m.gt_id").alias("gt_id"),
        F.col("m.iou_micro").alias("iou_micro"),
        F.col("m.pred_score").alias("pred_score"),
    )
    # best pred per claimed gt: max (pred_score, −pred_id)
    won = claims.groupBy(group_col, "gt_id").agg(
        F.max(
            F.struct(
                F.col("pred_score"), (-F.col("pred_id")).alias("np"),
                F.col("pred_id"), F.col("iou_micro"),
            )
        ).alias("m")
    )
    return won.select(
        group_col,
        F.col("m.pred_id").alias("pred_id"),
        "gt_id",
        F.col("m.iou_micro").alias("iou_micro"),
        F.col("m.pred_score").alias("pred_score"),
    )


def _morton8(cx: Column, cy: Column) -> Column:
    """Interleave the low 8 bits of (cx, cy) into a Morton key — pure
    Column fold over the bit positions, so the same arithmetic is
    re-expressible verbatim in ANSI SQL (see box_raster's oracle)."""
    expr: Column = F.lit(0).cast("long")
    for b in range(8):
        expr = (
            expr
            + F.shiftleft(
                F.shiftright(cx, b).bitwiseAND(F.lit(1)), 2 * b
            ).cast("long")
            + F.shiftleft(
                F.shiftright(cy, b).bitwiseAND(F.lit(1)), 2 * b + 1
            ).cast("long")
        )
    return expr


def box_raster(
    boxes: DataFrame,
    *,
    cell: int = 16,
    group_col: str = "image_id",
) -> DataFrame:
    """Box→tile rasterization: burn each image's bounding boxes onto the
    image's tile lattice (cell×cell pixel tiles), producing per occupied
    tile the number of boxes covering it and the EXACT total covered-pixel
    mass (sum over boxes of the box∩tile overlap area). This is the label-
    side twin of the polygon polyfill (operators/pip.polygon_tiles): a
    detection-corpus pipeline uses it to build per-tile object-density
    rasters (crop/mosaic planning, hard-example mining, label heatmaps)
    without decoding a single pixel.

    Scale shape: boxes are integer half-open rectangles, so the covered
    tile range per axis is [x0 // cell, (x1-1) // cell] — a bounded
    sequence-explode (≤ (canvas/cell)² cells/box, a constant), then ONE
    shuffle keyed by (image_id, tile) for the aggregate. No Python, no
    joins; the per-box fan-out is data-independent so there is no skew
    beyond the image-id distribution itself. covered_px can exceed the
    tile area when boxes overlap — it is a mass, not a coverage fraction;
    the exact integer makes the cross-engine hash bit-stable.

    Returns (image_id, tile, cell_x, cell_y, n_boxes, covered_px) with
    tile the 8-bit-per-axis Morton interleave of (cell_x, cell_y)."""
    c = F.lit(cell)
    b = boxes.select(
        group_col,
        "x0",
        "y0",
        "x1",
        "y1",
        F.floor(F.col("x0") / c).cast("int").alias("cx0"),
        F.floor((F.col("x1") - 1) / c).cast("int").alias("cx1"),
        F.floor(F.col("y0") / c).cast("int").alias("cy0"),
        F.floor((F.col("y1") - 1) / c).cast("int").alias("cy1"),
    )
    e = b.select(
        group_col,
        "x0",
        "y0",
        "x1",
        "y1",
        F.explode(F.sequence("cx0", "cx1")).alias("cell_x"),
        "cy0",
        "cy1",
    ).select(
        group_col,
        "x0",
        "y0",
        "x1",
        "y1",
        "cell_x",
        F.explode(F.sequence("cy0", "cy1")).alias("cell_y"),
    )
    ov_w = F.least(F.col("x1"), (F.col("cell_x") + 1) * c) - F.greatest(
        F.col("x0"), F.col("cell_x") * c
    )
    ov_h = F.least(F.col("y1"), (F.col("cell_y") + 1) * c) - F.greatest(
        F.col("y0"), F.col("cell_y") * c
    )
    out = (
        e.select(
            group_col,
            "cell_x",
            "cell_y",
            (ov_w * ov_h).cast("long").alias("ov"),
        )
        .groupBy(group_col, "cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_boxes"),
            F.sum("ov").alias("covered_px"),
        )
    )
    return out.select(
        group_col,
        _morton8(F.col("cell_x"), F.col("cell_y")).alias("tile"),
        F.col("cell_x").cast("long").alias("cell_x"),
        F.col("cell_y").cast("long").alias("cell_y"),
        "n_boxes",
        "covered_px",
    )
