#!/usr/bin/env python
"""Round-4 A/B for the 100-TB join arm (layer side beyond broadcast):
the PREFIX-partitioned interval join (plain and salted) against both the
old exploded-ancestor shuffle and the broadcast interval-stab baseline —
at 128M rows on a uniform corpus AND a skewed one (25% of rows in a
~0.003-degree hot box inside r_eu: one covering-cell key per level — and
one level-4 prefix — carries a quarter of the shuffle unless salted).

Fresh JVM per leg via bench.py (BENCH_ONLY_E2E, 2 warmups + best-of-3,
the w12-w14 split-sizing recipe baked into bench.py).  One JSON line per
leg to stdout; append to BENCH/r4_salted_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg(
    cpus: int,
    strategy: str,
    skew: float,
    n_images: int,
    salt: int = 8,
    warmups: int = 2,
    reps: int = 3,
) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY_E2E="1",
        BENCH_N_IMAGES=str(n_images),
        BENCH_WARMUPS=str(warmups),
        BENCH_E2E_REPS=str(reps),
        BENCH_PIP_STRATEGY=strategy,
        BENCH_PIP_SALT=str(salt),
        BENCH_SKEW_FRACTION=str(skew) if skew else "",
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=3000,
    )
    lines = out.stdout.strip().splitlines()
    if not lines:
        # surface the subprocess failure instead of dying on [-1]; the
        # caller records the failed leg and moves on
        sys.stderr.write(f"LEG FAILED {strategy} skew={skew}:\n{out.stderr[-2000:]}\n")
        return {"cpus": cpus, "strategy": strategy, "skew": skew, "error": "bench crashed"}
    d = json.loads(lines[-1])
    return {
        "cpus": cpus, "strategy": strategy, "skew": skew,
        "sec": d["queries"]["e2e_images"], "img_per_sec": d["images_per_sec"],
        "manifest_rows": d.get("manifest_rows"), "reps": reps,
    }


# (strategy, skew, warmups, reps): the exploded-ancestor arm is ~15x the
# others per rep, so it gets 1+2 (still best-of) while the rest keep the
# campaign-standard 2+3.
LEGS = [
    ("stab", 0.0, 2, 3),
    ("prefix_shuffled", 0.0, 2, 3),
    ("prefix_salted", 0.0, 2, 3),
    ("ancestor_shuffled", 0.0, 1, 2),
    ("stab", 0.25, 2, 3),
    ("prefix_shuffled", 0.25, 2, 3),
    ("prefix_salted", 0.25, 2, 3),
    ("ancestor_salted", 0.25, 1, 2),
]


def main() -> None:
    n_images = int(os.environ.get("AB_N_IMAGES", "128000000"))
    cpus = int(os.environ.get("AB_CPUS", "32"))
    skip = int(os.environ.get("AB_SKIP_LEGS", "0"))  # resume a crashed campaign
    for strategy, skew, warmups, reps in LEGS[skip:]:
        r = leg(cpus, strategy, skew, n_images, warmups=warmups, reps=reps)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
