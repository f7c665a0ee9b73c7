"""spark-submit entrypoint (north rule: 'runs via spark-submit --py-files
with no per-row Python'): the flagship cell-partitioned kNN join + tile
assignment as a standalone job. The package ships as a zip via --py-files
(tools/submit_demo.sh); this file only imports it.

    spark-submit --master local[8] --py-files /tmp/metric_search_spark.zip \
        tools/submit_job.py --images 100000 --k 10
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile-res", type=int, default=6)
    ap.add_argument("--index-path", default="")
    ap.add_argument(
        "--sphere-places",
        type=int,
        default=0,
        help="also run the full-sphere radius join over this many "
        "uniform whole-sphere points (0 = skip)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("metric-search-flagship").getOrCreate()

    from metric_search_spark.functions.spatial import coord_cols
    from metric_search_spark.operators.joins import KnnJoinStats, knn_join
    from metric_search_spark.operators.tiling import tile_assign
    from metric_search_spark.sources.synth import spark_images

    t0 = time.time()
    imgs = spark_images(spark, args.images, seed=42)
    xc, yc = coord_cols(F.col("phash"))
    tbl = imgs.select(
        F.substring("image_id", 4, 12).cast("long").alias("id"),
        xc.alias("x"),
        yc.alias("y"),
    ).persist()
    n = tbl.count()
    stats = KnnJoinStats()
    knn = knn_join(tbl, tbl, k=args.k, vec_col=None, stats=stats)
    tiles = tile_assign(tbl, res=args.tile_res).select(
        F.col("id").alias("query_id"), "tile"
    )
    rows = knn.join(tiles, "query_id").count()
    sphere_pairs = -1
    if args.sphere_places:
        from metric_search_spark.operators.geo import (
            haversine_radius_join_sphere,
        )

        pts = spark.range(args.sphere_places).select(
            F.col("id").alias("place_id"),
            (F.abs(F.hash(F.col("id"), F.lit(1))) % 170_000_001 - 85_000_000)
            .cast("long")
            .alias("lat_udeg"),
            (F.abs(F.hash(F.col("id"), F.lit(2))) % 360_000_001 - 180_000_000)
            .cast("long")
            .alias("lon_udeg"),
        )
        sphere_pairs = haversine_radius_join_sphere(pts, 2000.0).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_images": n,
                "result_rows": rows,
                "wall_s": round(wall, 2),
                "images_per_sec": round(n / wall, 1),
                "rounds": stats.rounds,
                "resolution": stats.resolution,
                "sphere_pairs": sphere_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
