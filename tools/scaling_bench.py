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
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
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
    n_high = 4 * n_low
    lo = run_bench(sf_dir, n_low)
    hi = run_bench(sf_dir, n_high)
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
    md = f"""# BENCH — two-parallelism scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N executors.
Sandbox protocol: the same flagship job (cell-partitioned kNN join k=10 +
tile assignment over the {lo['n_images']:,}-row synthetic image table) on
identical input at local[{n_low}] vs local[{n_high}].

Measured {stamp} ({sf_dir}):

| parallelism | images/sec (kNN+tile) | generate s | knn10_tile s | range_join s | tile_scan s |
|---|---|---|---|---|---|
| local[{n_low}] | {lo['images_per_sec']:,} | {lo['queries']['generate']} | {lo['queries']['knn10_tile']} | {lo['queries']['range_join']} | {lo['queries']['tile_scan']} |
| local[{n_high}] | {hi['images_per_sec']:,} | {hi['queries']['generate']} | {hi['queries']['knn10_tile']} | {hi['queries']['range_join']} | {hi['queries']['tile_scan']} |

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
