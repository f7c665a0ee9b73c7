"""N vs 4N executor-proxy scaling for the GEOSPATIAL wave (zone join).

Same container-faithful protocol as tools/executor_scaling.py (fixed 12 g
per-process heaps, -XX:ActiveProcessorCount pinned to the executor's core
budget, n_execs × cpus ≤ ~1/4 of host cores so added executors get idle
hardware), applied to a pure-geospatial job: the classified zone join of
hash-synthetic points against a 512-vertex polygon at res 6. Extends the
north rule's scaling evidence beyond the flagship kNN: the zone join is
the shape where the broadcast probe, not the shuffle, dominates.

Usage:
  python tools/geo_scaling.py [cpus_per_exec=2] [n_execs=4] [points=4000000]
  python tools/geo_scaling.py worker <cpus> <points>    (internal)
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, points: int) -> None:
    from pyspark.sql import functions as F

    from metric_search_spark.session import build_session
    from metric_search_spark.operators.pip import zone_join

    spark = build_session(cpus=cpus, shuffle_partitions=max(cpus * 2, 8))
    nv = 512
    ring = [
        {
            "x": 0.5 + 0.3 * math.cos(2 * math.pi * i / nv),
            "y": 0.5 + 0.3 * math.sin(2 * math.pi * i / nv),
        }
        for i in range(nv)
    ]
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("poly_id", StringType()),
            StructField(
                "ring",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    polys = spark.createDataFrame([("disc", ring)], schema)
    pts = (
        spark.range(points)
        .select(
            F.col("id"),
            (F.abs(F.hash(F.col("id"), F.lit(1))) % 1000000 / 1000000.0).alias("x"),
            (F.abs(F.hash(F.col("id"), F.lit(2))) % 1000000 / 1000000.0).alias("y"),
        )
        .localCheckpoint(eager=True)  # untimed generation, like bench warm-up
    )
    n_runs = int(os.environ.get("GEO_SCALING_RUNS", "3"))
    runs = []
    matched = 0
    for _ in range(n_runs):
        t0 = time.time()
        matched = zone_join(pts, polys, res=6).count()
        runs.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "points_per_sec": round(points / min(runs), 1),
                "runs": runs,
                "matched": matched,
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
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
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
