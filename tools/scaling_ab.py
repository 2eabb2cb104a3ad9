"""Interleaved strong-scaling A/B: {8,32} CPUs x {sort,direct} exchange.

Each cell runs bench.py --headline-only in a fresh process (BENCH_REPEATS=1,
no incremental epoch); rounds interleave all four cells so a co-tenant noise
window hits every cell instead of skewing one ratio. Prints one JSON line
with all samples plus best-of summaries. Run on an otherwise-idle box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _arg(name: str, default: str) -> str:
    return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default


def main() -> None:
    rounds = int(_arg("--rounds", "3"))
    cpus = [int(c) for c in _arg("--cpus", "8,32").split(",")]
    exchanges = _arg("--exchanges", "sort,direct").split(",")
    subprocess.run(
        [sys.executable, "-c",
         "import ray, sys; sys.path.insert(0,'.'); "
         "ray.init(address='local', num_cpus=8, include_dashboard=False, logging_level='ERROR'); "
         "import bench; bench.prepare_data(); ray.shutdown()"],
        check=True, cwd=ROOT)
    cells = [(ncpu, ex) for ncpu in cpus for ex in exchanges]
    samples: dict[str, list[float]] = {f"{n}:{e}": [] for n, e in cells}
    for _ in range(rounds):
        for ncpu, ex in cells:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), DATAXRAY_EXCHANGE=ex,
                       BENCH_SKIP_INCREMENTAL="1", BENCH_REPEATS="1")
            out = subprocess.run([sys.executable, "bench.py", "--headline-only"],
                                 env=env, capture_output=True, text=True,
                                 check=True, cwd=ROOT)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            samples[f"{ncpu}:{ex}"].append(r["value"])
            print(f"  {ncpu}cpu/{ex}: {r['value']}s", file=sys.stderr)
    best = {k: min(v) for k, v in samples.items()}
    lo, hi = min(cpus), max(cpus)
    eff = {ex: round((best[f"{lo}:{ex}"] / best[f"{hi}:{ex}"]) / (hi / lo), 3)
           for ex in exchanges}
    print(json.dumps({"samples": samples, "best": best,
                      "cpu_levels": [lo, hi],
                      "strong_scaling_efficiency": eff}))


if __name__ == "__main__":
    main()
