"""N vs 4N executor-proxy scaling for the GEODETIC kNN wave.

Same container-faithful protocol as tools/geo_scaling.py (fixed 12 g
per-process heaps via SPARK_DRIVER_MEMORY, -XX:ActiveProcessorCount pinned
through SPARK_GRAFT_JVM_PROCS, n_execs x cpus well under the host's cores
so added executors land on idle hardware), applied to the doubling-round
great-circle kNN (operators/geo.haversine_knn_join, k=5) over the hotspot
places fixture. Extends the scaling evidence to the wave where the
per-round window sort, not a broadcast probe, dominates.

Usage:
  python tools/geo_knn_scaling.py [cpus_per_exec=2] [n_execs=4] [places=200000]
  python tools/geo_knn_scaling.py worker <cpus> <places>    (internal)
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


def worker(cpus: int, places: int) -> None:
    from metric_search_spark.operators.geo import (
        haversine_knn_join,
        synth_places,
    )
    from metric_search_spark.session import build_session

    spark = build_session(cpus=cpus, shuffle_partitions=max(cpus * 2, 8))
    # density-matched r0 (same formula as bench.py): hotspot fixture covers
    # ~2136 km^2, expected 5-NN radius sqrt(6/(pi*density)); the factor
    # trades round-0 candidate volume (~factor^2) against residual rounds —
    # 1.4 halves the window-sort bandwidth vs 2.0, which matters most when
    # 4 concurrent executors share DRAM
    factor = float(os.environ.get("GEO_KNN_R0_FACTOR", "1.4"))
    r0 = factor * math.sqrt(6.0 * 2.136e9 / (math.pi * places))
    pl = synth_places(spark, places, seed=7).localCheckpoint(eager=True)
    n_runs = int(os.environ.get("GEO_SCALING_RUNS", "3"))
    runs = []
    rows = 0
    for _ in range(n_runs):
        t0 = time.time()
        rows = haversine_knn_join(pl, 5, r0_m=r0).count()
        runs.append(round(time.time() - t0, 2))
    assert rows == places * 5, (rows, places)
    print(
        json.dumps(
            {
                "places_per_sec": round(places / min(runs), 1),
                "runs": runs,
                "rows": rows,
            }
        ),
        flush=True,
    )
    spark.stop()


def run_one(cpus: int, places: int, tag: str, results: dict) -> None:
    env = dict(
        os.environ,
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "12g"),
        SPARK_GRAFT_JVM_PROCS=os.environ.get("SPARK_GRAFT_JVM_PROCS", str(cpus)),
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "worker", str(cpus), str(places)],
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
    places = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    single: dict = {}
    run_one(cpus, places, "single", single)
    print(json.dumps({"phase": f"1x_local{cpus}", **single["single"]}), flush=True)
    multi: dict = {}
    threads = [
        threading.Thread(target=run_one, args=(cpus, places, f"j{i}", multi))
        for i in range(n_execs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(json.dumps({"phase": f"{n_execs}x_local{cpus}", "jobs": multi}), flush=True)
    t1 = single["single"].get("places_per_sec") or 0
    agg = sum(j.get("places_per_sec") or 0 for j in multi.values())
    eff = agg / (n_execs * t1) if t1 else None
    print(
        json.dumps(
            {
                "aggregate_places_per_sec": round(agg, 1),
                "scaling_efficiency": round(eff, 3) if eff else None,
                "target": 0.8,
                "pass": bool(eff and eff >= 0.8),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
