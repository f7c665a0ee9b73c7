"""N vs 4N executor-proxy scaling for the FULL-SPHERE radius join.

Same container-faithful protocol as tools/executor_scaling.py /
geo_scaling.py (fixed per-process heaps via SPARK_DRIVER_MEMORY, JVM
-XX:ActiveProcessorCount pinned through SPARK_GRAFT_JVM_PROCS, n_execs x
cpus well under the host budget), applied to
operators/geo.haversine_radius_join_sphere: the secant-window wrapped-
ring grid join plus the polar-cap azimuthal path, over points uniform in
(lat, lon) across the WHOLE sphere — every latitude band, both caps, and
the antimeridian seam are in the working set, so the measurement
exercises the row-adaptive fan-out (15 at the equator, wider toward the
caps), not just the planar-equivalent regime.

Usage:
  python tools/sphere_scaling.py [cpus_per_exec=2] [n_execs=4] [points=1000000]
  python tools/sphere_scaling.py worker <cpus> <points>    (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RADIUS_M = 2000.0


def worker(cpus: int, points: int) -> None:
    from pyspark.sql import functions as F

    from metric_search_spark.operators.geo import haversine_radius_join_sphere
    from metric_search_spark.session import build_session

    spark = build_session(cpus=cpus, shuffle_partitions=max(cpus * 2, 8))
    # uniform full-sphere points: every lat band populated (cap rows are
    # ~2.2% at the 2-deg default), lon spans the seam
    pts = (
        spark.range(points)
        .select(
            F.col("id").alias("place_id"),
            (F.abs(F.hash(F.col("id"), F.lit(1))) % 170_000_001 - 85_000_000)
            .cast("long")
            .alias("lat_udeg"),
            (F.abs(F.hash(F.col("id"), F.lit(2))) % 360_000_001 - 180_000_000)
            .cast("long")
            .alias("lon_udeg"),
        )
        .localCheckpoint(eager=True)  # untimed generation
    )
    n_runs = int(os.environ.get("SPHERE_SCALING_RUNS", "3"))
    runs = []
    pairs = 0
    for _ in range(n_runs):
        t0 = time.time()
        pairs = haversine_radius_join_sphere(pts, RADIUS_M).count()
        runs.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "points_per_sec": round(points / min(runs), 1),
                "runs": runs,
                "pairs": pairs,
            }
        ),
        flush=True,
    )
    spark.stop()


def run_one(cpus: int, points: int, tag: str, results: dict) -> None:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "12g"),
        SPARK_GRAFT_JVM_PROCS=os.environ.get("SPARK_GRAFT_JVM_PROCS", str(cpus)),
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "worker", str(cpus), str(points)],
        env=env,
        capture_output=True,
        text=True,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    results[tag] = json.loads(lines[-1]) if lines else {"error": out.stderr[-300:]}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_execs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    single: dict = {}
    run_one(cpus, points, "single", single)
    print(json.dumps({"phase": f"1x_local{cpus}", **single["single"]}), flush=True)
    multi: dict = {}
    threads = [
        threading.Thread(target=run_one, args=(cpus, points, f"j{i}", multi))
        for i in range(n_execs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(json.dumps({"phase": f"{n_execs}x_local{cpus}", "jobs": multi}), flush=True)
    t1 = single["single"].get("points_per_sec") or 0
    agg = sum(j.get("points_per_sec") or 0 for j in multi.values())
    eff = agg / (n_execs * t1) if t1 else None
    print(
        json.dumps(
            {
                "aggregate_points_per_sec": round(agg, 1),
                "scaling_efficiency": round(eff, 3) if eff else None,
                "target": 0.8,
                "pass": bool(eff and eff >= 0.8),
            }
        )
    )


if __name__ == "__main__":
    main()
