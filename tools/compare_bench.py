"""Round-over-round bench comparison with contention context (r16).

Compares two bench artifacts (BENCH_r{N}.json driver records, with the
headline under "parsed", or BENCH_DETAIL*.json builder records) on
their shared entries and prints per-entry ratios — annotated, when both
sides carry BENCH_DETAIL cpu_sec, with the process-tree CPU ratio so a
wall regression under contention is separable from a plan regression
without a quiet-window re-measure (VERDICT r15 wrong #2: wall 42% up
with flat CPU is "fewer cycles", not "slower code").

Usage: python tools/compare_bench.py OLD.json NEW.json [threshold]
       threshold (default 1.3): only entries whose wall ratio exceeds
       it (either direction, ratio or 1/ratio) are listed; the summary
       line always prints.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple[dict, dict]:
    """(wall timings, cpu_sec) from either artifact shape."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver record
        d = d["parsed"]
    wall = d.get("queries", {}) or {}
    cpu = d.get("cpu_sec", {}) or {}
    return wall, cpu


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_w, old_c = _load(sys.argv[1])
    new_w, new_c = _load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(old_w) & set(new_w))
    if not shared:
        print("no shared entries")
        return 1
    rows = []
    sum_old = sum_new = 0.0
    for name in shared:
        ow, nw = old_w[name], new_w[name]
        sum_old += ow
        sum_new += nw
        ratio = nw / ow if ow > 0 else float("inf")
        cpu_note = ""
        oc, nc = old_c.get(name), new_c.get(name)
        if oc and nc and oc > 0.2:
            cr = nc / oc
            cpu_note = f" cpu {oc:.2f}->{nc:.2f}s ({cr:.2f}x)"
            if ratio > 1.5 and cr < 1.2:
                cpu_note += " [ENV: wall grew, CPU flat]"
        if ratio > thr or (ratio > 0 and 1 / ratio > thr):
            rows.append((ratio, name, ow, nw, cpu_note))
    for ratio, name, ow, nw, cpu_note in sorted(rows, reverse=True):
        print(f"{name}: {ow:.3f}s -> {nw:.3f}s ({ratio:.2f}x){cpu_note}")
    print(
        f"# shared {len(shared)} entries: {sum_old:.1f}s -> {sum_new:.1f}s "
        f"({sum_new / max(sum_old, 1e-9):.3f}x); {len(rows)} beyond {thr}x"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
