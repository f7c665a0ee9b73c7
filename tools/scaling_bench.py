"""Two-parallelism scaling protocol (BASELINE.json north rule, sandbox form):
run bench.py on the SAME input at local[N] and local[4N], report images/sec at
both and the per-core scaling efficiency (throughput_4N / throughput_N) / 4.

Writes/updates BENCH/BASELINE.md. Usage:
    python tools/scaling_bench.py [sf_dir] [N (default 8)]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        # the scaling comparison times the headline kNN+tile job only; the
        # image count is overridable so the comparison runs CPU-bound
        SPARK_GRAFT_BENCH_QUERIES="knn10_tile",
        # 8M rows keeps the job CPU-bound: the r2 kernel is ~5× faster than
        # r1's, and at 2M the 4-core run already finishes in ~6s — scheduler
        # overhead would dominate any higher parallelism
        SPARK_GRAFT_BENCH_IMAGES=os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "8000000"),
        SPARK_GRAFT_BENCH_RUNS=os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_high = 4 * n_low
    # the sandbox box is co-tenanted (load from outside this container):
    # interleave the two configs and keep each one's best round so a noisy
    # window does not land on only one side of the comparison
    lo = hi = None
    for _ in range(rounds):
        r_lo = run_bench(sf_dir, n_low)
        r_hi = run_bench(sf_dir, n_high)
        if lo is None or r_lo["images_per_sec"] > lo["images_per_sec"]:
            lo = r_lo
        if hi is None or r_hi["images_per_sec"] > hi["images_per_sec"]:
            hi = r_hi
    eff = (hi["images_per_sec"] / lo["images_per_sec"]) / (n_high / n_low)
    report = {
        "sf": sf_dir,
        "n_images": lo["n_images"],
        "low": {"cpus": n_low, **{k: lo[k] for k in ("images_per_sec", "queries")}},
        "high": {"cpus": n_high, **{k: hi[k] for k in ("images_per_sec", "queries")}},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")

    def row(name: str, r: dict) -> str:
        q = r["queries"]
        return (
            f"| {name} | {r['images_per_sec']:,} | {q.get('generate', '—')} | "
            f"{q.get('knn10_tile', '—')} | {q.get('range_join', '—')} | "
            f"{q.get('tile_scan', '—')} |"
        )

    md = f"""# BENCH — two-parallelism scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N executors.
Sandbox protocol: the same flagship job (cell-partitioned kNN join k=10 +
tile assignment over the {lo['n_images']:,}-row synthetic image table) on
identical input at local[{n_low}] vs local[{n_high}], interleaved over
{rounds} rounds (co-tenanted host — best round per config), CPU-bound sizing.

Measured {stamp} ({sf_dir}):

| parallelism | images/sec (kNN+tile) | generate s | knn10_tile s | range_join s | tile_scan s |
|---|---|---|---|---|---|
{row(f'local[{n_low}]', lo)}
{row(f'local[{n_high}]', hi)}

**Scaling efficiency (per-core): {eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Raw JSON:

```json
{json.dumps(lo, indent=2)}
```

```json
{json.dumps(hi, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
