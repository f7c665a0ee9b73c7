"""N vs 4N EXECUTOR scaling protocol (the BENCH/BASELINE.md headline).

The north rule's unit is the executor; on one sandbox host the faithful
instantiation is independent executor PROCESSES (own JVM, GC, shuffle
service, Python worker pool), not threads inside one JVM. This runs the
identical flagship job as 1 process, then as `n_execs` concurrent
processes, and reports aggregate-throughput scaling efficiency. Keep
n_execs × cpus_per_exec ≤ ~1/4 of host cores so each added executor gets
genuinely idle hardware (the cluster situation the rule describes);
saturating configurations measure host DRAM sharing, not the engine.

Usage: python tools/executor_scaling.py [cpus_per_exec=2] [n_execs=4] [images=1000000]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bench_env(cpus: int, images: int) -> dict:
    return dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_QUERIES="knn10_tile",
        SPARK_GRAFT_BENCH_IMAGES=str(images),
        SPARK_GRAFT_BENCH_RUNS=os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"),
        # r2-identical protocol: light warm-up so concurrent jobs stay
        # synchronized and the untimed contention window stays short (the
        # full-size default quadruples each job's untimed work, which
        # desynchronizes the fleet and overlaps timed runs with warm-ups)
        SPARK_GRAFT_BENCH_WARMUP_IMAGES=os.environ.get(
            "SPARK_GRAFT_BENCH_WARMUP_IMAGES", "100000"
        ),
        # fixed per-executor-process heap, sized so 4 concurrent JVMs +
        # python workers fit host RAM with headroom. The engine default
        # (48g, right for ONE local[32] process) over-commits 4× here:
        # heaps grow lazily across runs until the fleet starts thrashing —
        # the r2 artifacts already show every 4x job's run-2 at ~2.5× run-1
        # (executor_proxy_4x2.jsonl), and run-1s degrade too once the box
        # is warm. Real cluster executors have fixed small heaps; this is
        # the faithful setting, applied to BOTH phases for symmetry.
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "12g"),
        # container-faithful JVM ergonomics: GC/JIT thread pools sized to the
        # executor's core budget (what a cgroup gives a real executor), not
        # the 32-core host — without this, 4 concurrent JVMs spawn ~23 GC
        # workers EACH and the steady-state 4x phase measures GC-thread
        # storms, not the engine. Applied to BOTH phases for symmetry.
        SPARK_GRAFT_JVM_PROCS=os.environ.get("SPARK_GRAFT_JVM_PROCS", str(cpus)),
    )


def run_one(cpus: int, images: int, tag: str, results: dict) -> None:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=bench_env(cpus, images),
        capture_output=True,
        text=True,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        results[tag] = {"error": out.stderr[-300:]}
        return
    r = json.loads(lines[-1])
    results[tag] = {
        "images_per_sec": r["images_per_sec"],
        "runs": r["queries"]["knn10_tile_runs"],
    }


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_execs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    images = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    single: dict = {}
    run_one(cpus, images, "single", single)
    print(json.dumps({"phase": f"1x_local{cpus}", **single["single"]}), flush=True)
    multi: dict = {}
    threads = [
        threading.Thread(target=run_one, args=(cpus, images, f"j{i}", multi))
        for i in range(n_execs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(json.dumps({"phase": f"{n_execs}x_local{cpus}", "jobs": multi}), flush=True)
    t1 = single["single"].get("images_per_sec") or 0
    agg = sum(j.get("images_per_sec") or 0 for j in multi.values())
    eff = agg / (n_execs * t1) if t1 else None
    print(
        json.dumps(
            {
                "aggregate_images_per_sec": round(agg, 1),
                "scaling_efficiency": round(eff, 3) if eff else None,
                "target": 0.8,
                "pass": bool(eff and eff >= 0.8),
            }
        )
    )


if __name__ == "__main__":
    main()
