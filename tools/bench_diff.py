#!/usr/bin/env python3
"""Diff two durable bench records (bench/bench_<sf>_rNN.json).

Usage: python3 tools/bench_diff.py bench/bench_sf0.1_r10.json bench/bench_sf0.1_r11.json [threshold]

Prints per-query deltas sorted by absolute regression, flagging queries
slower by more than `threshold` ratio (default 1.5x) AND more than 0.2 s
(ambient noise on this host is ±30%, so small absolute deltas are not
signal). Exit code 0 always — this is a lens, not a gate.
"""
import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    print(f"total: {a['value']:.1f} s ({len(qa)} queries) -> "
          f"{b['value']:.1f} s ({len(qb)} queries)")
    for name, kind in [(set(qb) - set(qa), "added"), (set(qa) - set(qb), "removed")]:
        if name:
            print(f"{kind}: {sorted(name)}")
    common = sorted(set(qa) & set(qb), key=lambda k: qa[k] - qb[k])
    flagged = []
    for k in common:
        va, vb = qa[k], qb[k]
        if va <= 0 or vb <= 0:
            continue
        if vb / va >= threshold and vb - va >= 0.2:
            flagged.append((k, va, vb))
    if flagged:
        print(f"\nslower by >= {threshold}x and >= 0.2 s:")
        for k, va, vb in sorted(flagged, key=lambda t: t[1] - t[2]):
            print(f"  {k:32s} {va:7.3f} -> {vb:7.3f}  ({vb / va:.2f}x)")
    else:
        print(f"\nno query slower by >= {threshold}x and >= 0.2 s")
    print("\nbiggest improvements:")
    for k in common[-5:][::-1]:
        if qa[k] - qb[k] > 0.1:
            print(f"  {k:32s} {qa[k]:7.3f} -> {qb[k]:7.3f}  ({qb[k] / qa[k]:.2f}x)")


if __name__ == "__main__":
    main()
