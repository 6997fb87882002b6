#!/usr/bin/env python
"""Round-3 pinned-core strategy A/B: metadata e2e at 128M rows, 2 vs 8
pinned cores, stab vs range join strategy.  Fresh JVM per leg via bench.py
(BENCH_ONLY_E2E), per-rep times parsed from its JSON.  Writes one JSON line
per leg to stdout."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg(cpus: int, strategy: str, warmups: int, n_images: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY_E2E="1",
        BENCH_N_IMAGES=str(n_images),
        BENCH_WARMUPS=str(warmups),
        BENCH_PIP_STRATEGY=strategy,
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3000,
    )
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    return {"cpus": cpus, "strategy": strategy,
            "sec": d["queries"]["e2e_images"], "img_per_sec": d["images_per_sec"]}


def main() -> None:
    n_images = int(os.environ.get("AB_N_IMAGES", "128000000"))
    res = []
    for strategy in ("stab", "range"):
        for cpus in (2, 8):
            r = leg(cpus, strategy, warmups=2, n_images=n_images)
            res.append(r)
            print(json.dumps(r), flush=True)
    by = {(r["strategy"], r["cpus"]): r["img_per_sec"] for r in res}
    for s in ("stab", "range"):
        eff = by[(s, 8)] / (4 * by[(s, 2)])
        print(json.dumps({"strategy": s, "efficiency_2v8": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
