"""Ray-free concurrency microbenchmark: N processes each decode the same
zstd parquet shard repeatedly; report per-decode wall time at each N.
If per-op time inflates with N while total CPUs >= N, the box's shared
memory/bandwidth saturates — strong-scaling attribution evidence."""
import glob
import json
import multiprocessing as mp
import os
import sys
import time


def worker(path, reps, q):
    import pyarrow.parquet as pq
    t0 = time.perf_counter()
    c0 = time.process_time()
    for _ in range(reps):
        pq.read_table(path)
    q.put((time.perf_counter() - t0, time.process_time() - c0, reps))


def run(n, path, reps):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(path, reps, q)) for _ in range(n)]
    t0 = time.perf_counter()
    [p.start() for p in ps]
    res = [q.get() for _ in ps]
    [p.join() for p in ps]
    wall = time.perf_counter() - t0
    per_op_cpu = sum(c for _, c, _ in res) / sum(r for _, _, r in res)
    return {"n": n, "wall": round(wall, 2),
            "per_op_cpu_s": round(per_op_cpu, 3),
            "ops_per_s": round(n * reps / wall, 2)}


if __name__ == "__main__":
    shard = sorted(glob.glob("/tmp/dataxray_bench/data/events/*.parquet"))[0]
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    # optional: --n 2,8,32 picks process counts; --pin confines each level to
    # cores 0..n-1 (the same affinity protocol as bench.py --scaling-weak,
    # so the ideal ceiling is measured under the engine's own conditions)
    ns = (2, 8, 32) if "--n" not in sys.argv else tuple(
        int(x) for x in sys.argv[sys.argv.index("--n") + 1].split(","))
    pin = "--pin" in sys.argv
    out = []
    for n in ns:
        if pin and hasattr(os, "sched_setaffinity"):
            os.sched_setaffinity(0, set(range(n)))  # children inherit
        out.append(run(n, shard, reps))
    if pin and hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(range(os.cpu_count() or 1)))
    print(json.dumps(out))
