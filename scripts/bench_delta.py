#!/usr/bin/env python
"""Per-query bench delta table (VERDICT r3 task 8): compare a fresh bench
JSON against the previous round's driver snapshot so regressions surface
in-round, not at judging.

Usage: python scripts/bench_delta.py NEW.json [OLD.json]  (default OLD =
BENCH_r03.json).  Accepts either the driver wrapper shape ({"parsed": {...}})
or bench.py's raw one-line JSON.  Prints a markdown table sorted by worst
relative regression first and exits 1 if any query regressed >20% (the
knn-in-r3 class of slip).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    new = load(sys.argv[1])
    old = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_r03.json")
    nq, oq = new["queries"], old["queries"]
    rows = []
    for name in sorted(set(nq) | set(oq)):
        a, b = oq.get(name), nq.get(name)
        delta = (b - a) / a if (a and b) else None
        rows.append((name, a, b, delta))
    rows.sort(key=lambda r: -(r[3] if r[3] is not None else float("-inf")))
    print("| query | r3 (s) | r4 (s) | delta |")
    print("|---|---|---|---|")
    bad = []
    for name, a, b, delta in rows:
        ds = f"{delta:+.0%}" if delta is not None else "new/gone"
        print(f"| {name} | {a if a is not None else '—'} | {b if b is not None else '—'} | {ds} |")
        if delta is not None and delta > 0.20:
            bad.append(name)
    e_old, e_new = old.get("value"), new.get("value")
    if e_old and e_new:
        print(f"\ne2e headline: {e_old} -> {e_new} s ({(e_new - e_old) / e_old:+.0%})")
    if bad:
        print(f"\nREGRESSED >20%: {', '.join(bad)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
