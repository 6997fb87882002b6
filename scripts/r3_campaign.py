#!/usr/bin/env python
"""Round-3 metadata-path scaling campaign: N windows of the 2-vs-8
pinned-core e2e job (identical recipe per window), one JSON line per
window.  Each leg is one fresh-JVM bench.py run (BENCH_WARMUPS=1 + its
internal best-of-3) — the same effective sampling at every window."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_IMAGES = int(os.environ.get("CAMPAIGN_N_IMAGES", "128000000"))
N_WINDOWS = int(os.environ.get("CAMPAIGN_WINDOWS", "5"))


def leg(cpus: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY_E2E="1",
        BENCH_N_IMAGES=str(N_IMAGES),
        BENCH_WARMUPS="1",
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3000,
    )
    d = json.loads(out.stdout.strip().splitlines()[-1])
    return {"sec": d["queries"]["e2e_images"], "img_per_sec": d["images_per_sec"]}


def main() -> None:
    for w in range(1, N_WINDOWS + 1):
        small = leg(2)
        big = leg(8)
        eff = big["img_per_sec"] / (4.0 * small["img_per_sec"])
        print(
            json.dumps(
                {"window": w, "local2_sec": small["sec"], "local8_sec": big["sec"],
                 "efficiency": round(eff, 3)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
