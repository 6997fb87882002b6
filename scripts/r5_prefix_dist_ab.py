#!/usr/bin/env python
"""Round-5 A/B for the fully DISTRIBUTED prefix join arm (task 1 done
criterion): pip_join(covering_frame=executor-built covering) against the
driver-list prefix arm at 128M rows, uniform and 25%-hot-box skew — the new
arm must sit within noise of the list-based one (the covering here is tiny,
so the A/B isolates the plan overhead of the semi-join prune + distributed
covering build, which is what a 100k-layer dimension would rely on).

Fresh JVM per leg via bench.py (BENCH_ONLY_E2E, 2 warmups + best-of-3).
One JSON line per leg to stdout; append to BENCH/r5_prefix_dist_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg(cpus: int, strategy: str, skew: float, n_images: int, warmups: int = 2, reps: int = 3) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY_E2E="1",
        BENCH_N_IMAGES=str(n_images),
        BENCH_WARMUPS=str(warmups),
        BENCH_E2E_REPS=str(reps),
        BENCH_PIP_STRATEGY=strategy,
        BENCH_SKEW_FRACTION=str(skew) if skew else "",
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3000,
    )
    lines = out.stdout.strip().splitlines()
    if not lines:
        sys.stderr.write(f"LEG FAILED {strategy} skew={skew}:\n{out.stderr[-2000:]}\n")
        return {"cpus": cpus, "strategy": strategy, "skew": skew, "error": "bench crashed"}
    d = json.loads(lines[-1])
    return {
        "cpus": cpus, "strategy": strategy, "skew": skew,
        "sec": d["queries"]["e2e_images"], "img_per_sec": d["images_per_sec"],
        "manifest_rows": d.get("manifest_rows"), "reps": reps,
    }


LEGS = [
    ("prefix_shuffled", 0.0),
    ("prefix_dist", 0.0),
    ("prefix_shuffled", 0.25),
    ("prefix_dist", 0.25),
]

# the Bloom-rung A/B (terminal probe prune forced vs the auto IN-set rung,
# same distributed covering): AB_LEGS=bloom
BLOOM_LEGS = [
    ("prefix_dist", 0.0),
    ("prefix_dist_bloom", 0.0),
    ("prefix_dist", 0.25),
    ("prefix_dist_bloom", 0.25),
]


def main() -> None:
    n_images = int(os.environ.get("AB_N_IMAGES", "128000000"))
    cpus = int(os.environ.get("AB_CPUS", "32"))
    skip = int(os.environ.get("AB_SKIP_LEGS", "0"))
    legs = BLOOM_LEGS if os.environ.get("AB_LEGS", "") == "bloom" else LEGS
    legs = legs[skip:]
    max_legs = int(os.environ.get("AB_MAX_LEGS", "0"))
    if max_legs:
        legs = legs[:max_legs]
    for strategy, skew in legs:
        print(json.dumps(leg(cpus, strategy, skew, n_images)), flush=True)


if __name__ == "__main__":
    main()
