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
    # only regressions (and unadjudicated deltas) fail the gate; a genuine
    # improvement with disjoint intervals is reported informationally.
    # Per-query ratios are normalized by the catalog-median ratio (the
    # "global shift"): a uniformly loaded box moves every query together,
    # which is contention, not 85 simultaneous plan changes.
    ratios = sorted(new_q[n] / old_q[n] for n in set(old_q) & set(new_q)
                    if old_q[n] > 0 and new_q[n] > 0)
    global_shift = ratios[len(ratios) // 2] if ratios else 1.0
    regressed = improved = noisy = unadjudicated = unbaselined = 0
    for name in sorted(set(old_q) & set(new_q)):
        om, nm = old_q[name], new_q[name]
        if om <= 0 or nm <= 0:
            # a -1.0 sentinel (failed rep) on either side: nothing to
            # compare, but say so loudly — a silent skip here once left
            # three repaired queries with no adjudicated baseline.
            unbaselined += 1
            side = "old" if om <= 0 else "new"
            print(f"no-baseline {name}: {side} run carries a failure sentinel "
                  f"({om:.3f} -> {nm:.3f}) — not adjudicated, re-bench to baseline it")
            continue
        r = (nm / om) / global_shift
        if r <= ratio and r >= 1 / ratio:
            continue
        direction = "REGRESSED" if r > 1 else "improved"
        osp, nsp = old_s.get(name), new_s.get(name)
        if osp and nsp and min(osp[2], nsp[2]) >= max(osp[0], nsp[0]):
            noisy += 1
            print(f"noise     {name}: {om:.3f} -> {nm:.3f} ({nm/om:.2f}x raw, {r:.2f}x norm) — rep intervals overlap "
                  f"[{osp[0]:.2f},{osp[2]:.2f}] vs [{nsp[0]:.2f},{nsp[2]:.2f}]")
        elif osp and nsp and r > 1 and nsp[0] / global_shift <= osp[2] * 1.25:
            # the r13 run-L rule automated (VERDICT r14 #6): the new
            # run's FASTEST rep lands within 25% of the committed
            # interval's top (the intervals nearly touch) — the query
            # still runs at near-committed speed on this box; the median
            # shift is per-rep contention, not a plan change (a real
            # regression moves the whole interval away and keeps its
            # "REGRESSED" verdict). The fastest rep is shift-normalized
            # like the median (ADVICE r15): on a fast box a genuine
            # 1.5x-norm regression has a raw ratio near 1.0 and its raw
            # min would always sit inside the raw band.
            noisy += 1
            # print the NORMALIZED best rep — the quantity the rule
            # tests; the raw value can read as contradicting the verdict
            print(f"noise_spread_overlap {name}: {om:.3f} -> {nm:.3f} ({nm/om:.2f}x raw, {r:.2f}x norm) — "
                  f"best rep {nsp[0] / global_shift:.3f} (norm) within 1.25x of committed max {osp[2]:.3f}")
        elif osp and nsp:
            if r > 1:
                regressed += 1
            else:
                improved += 1
            print(f"{direction} {name}: {om:.3f} -> {nm:.3f} ({nm/om:.2f}x raw, {r:.2f}x norm) — disjoint intervals "
                  f"[{osp[0]:.2f},{osp[2]:.2f}] vs [{nsp[0]:.2f},{nsp[2]:.2f}]")
        else:
            unadjudicated += 1
            print(f"{direction} {name}: {om:.3f} -> {nm:.3f} ({nm/om:.2f}x raw, {r:.2f}x norm) — no spread data, unadjudicated")
    print(f"\n{regressed} regressed / {improved} improved / {noisy} noise-band / "
          f"{unadjudicated} unadjudicated / {unbaselined} no-baseline "
          f"(normalized ratio > {ratio}x, global shift {global_shift:.2f}x)")
    return 1 if (regressed or unadjudicated) else 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], r))
