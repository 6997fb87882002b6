#!/usr/bin/env python
"""Pinned-memory decomposition (round-3): prove the metadata-path N->4N
shortfall is machine-shared cost, not plan cost.

Runs the IDENTICAL 128M-row e2e job as 4 fully independent JVM processes,
each pinned to its own disjoint 2-core set (the sandbox analog of 4
executors x 2 cores on ONE box sharing a memory system), and compares
per-job time against the solo 2-core leg measured in the same session.

If the 4 independent processes slow down to the point where their aggregate
throughput matches the single 8-core leg, the 8-core shortfall cannot be
plan serialization (the processes share NOTHING above the hardware): it is
the box's shared memory system — which a real 4-executor cluster, with 4
separate memory systems, does not share.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_IMAGES = int(os.environ.get("AB_N_IMAGES", "128000000"))


def spawn(core_lo: int, core_hi: int):
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(core_hi - core_lo + 1),
        BENCH_ONLY_E2E="1",
        BENCH_N_IMAGES=str(N_IMAGES),
        BENCH_WARMUPS="1",
    )
    return subprocess.Popen(
        ["taskset", "-c", f"{core_lo}-{core_hi}", sys.executable,
         os.path.join(REPO, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd=REPO,
    )


def main() -> None:
    # solo control in the same noise window
    p = spawn(0, 1)
    out, _ = p.communicate(timeout=3000)
    solo = json.loads(out.strip().splitlines()[-1])
    print(json.dumps({"solo_2c_sec": solo["queries"]["e2e_images"],
                      "solo_img_per_sec": solo["images_per_sec"]}), flush=True)

    t0 = time.time()
    procs = [spawn(2 * i, 2 * i + 1) for i in range(4)]
    outs = [json.loads(p.communicate(timeout=3000)[0].strip().splitlines()[-1]) for p in procs]
    wall = time.time() - t0
    per_job = [o["queries"]["e2e_images"] for o in outs]
    agg = sum(o["images_per_sec"] for o in outs)
    print(json.dumps({
        "concurrent_2c_x4_sec": per_job,
        "aggregate_img_per_sec": agg,
        "wall_sec": round(wall, 1),
        "slowdown_vs_solo": [round(s / solo["queries"]["e2e_images"], 3) for s in per_job],
    }), flush=True)


if __name__ == "__main__":
    main()
