#!/usr/bin/env python3
"""Compare two Bench JSON artifacts using the per-query spread.

    python3 scripts/compare_bench.py OLD.json NEW.json [ratio]

A query is flagged REGRESSED only when its [min, max] rep intervals are
DISJOINT between the runs and the median moved by more than `ratio`
(default 1.5x): overlapping intervals mean the delta is inside this
box's documented noise band, however large the median ratio looks.
Artifacts without "queries_spread" (pre-round-4) degrade to a
median-ratio-only comparison, clearly marked as unadjudicated.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    qs = d.get("queries", {})
    spread = d.get("queries_spread") or {}
    return qs, spread


def main(old_path, new_path, ratio=1.5):
    old_q, old_s = load(old_path)
    new_q, new_s = load(new_path)
    flagged = noisy = 0
    for name in sorted(set(old_q) & set(new_q)):
        om, nm = old_q[name], new_q[name]
        if om <= 0 or nm <= 0:
            continue
        r = nm / om
        if r <= ratio and r >= 1 / ratio:
            continue
        direction = "REGRESSED" if r > 1 else "improved"
        osp, nsp = old_s.get(name), new_s.get(name)
        if osp and nsp and min(osp[2], nsp[2]) >= max(osp[0], nsp[0]):
            noisy += 1
            print(f"noise     {name}: {om:.3f} -> {nm:.3f} ({r:.2f}x) — rep intervals overlap "
                  f"[{osp[0]:.2f},{osp[2]:.2f}] vs [{nsp[0]:.2f},{nsp[2]:.2f}]")
        elif osp and nsp:
            flagged += 1
            print(f"{direction} {name}: {om:.3f} -> {nm:.3f} ({r:.2f}x) — disjoint intervals "
                  f"[{osp[0]:.2f},{osp[2]:.2f}] vs [{nsp[0]:.2f},{nsp[2]:.2f}]")
        else:
            flagged += 1
            print(f"{direction} {name}: {om:.3f} -> {nm:.3f} ({r:.2f}x) — no spread data, unadjudicated")
    print(f"\n{flagged} real deltas / {noisy} noise-band deltas (ratio > {ratio}x)")
    return 1 if flagged else 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], r))
