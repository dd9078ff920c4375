"""Compare two bench_queries.json-style sidecars per query.

Usage: python tools/compare_bench.py <before.json> <after.json> [top_n]

Prints per-query before/after medians sorted by absolute delta, plus
sum-of-medians totals and the canary context of both runs so a host
speed difference is visible next to the deltas.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    qb, qa = before["queries"], after["queries"]
    # largest |delta| first so top_n keeps the biggest movers in BOTH
    # directions (r10 advice: the old signed-ascending sort silently
    # dropped the largest regressions past top_n)
    common = sorted(set(qb) & set(qa), key=lambda k: -abs(qa[k] - qb[k]))
    print(f"{'query':42s} {'before':>8s} {'after':>8s} {'delta':>8s}")
    shown = [k for k in common if abs(qa[k] - qb[k]) >= 0.15][:top_n]
    shown.sort(key=lambda k: qa[k] - qb[k])
    for k in shown:
        print(f"{k:42s} {qb[k]:8.2f} {qa[k]:8.2f} {qa[k]-qb[k]:+8.2f}")
    tb = sum(qb[k] for k in common)
    ta = sum(qa[k] for k in common)
    print(f"\ncommon-{len(common)} sum-of-medians: {tb:.1f} -> {ta:.1f} "
          f"({ta/tb:.3f}x)")
    for label, d in (("before", before), ("after", after)):
        print(f"{label}: pass_totals={d.get('pass_totals')} "
              f"canary={d.get('canary_sec_start')}->{d.get('canary_sec_end')} "
              f"load={d.get('load_1m_start')}->{d.get('load_1m_end')}")


if __name__ == "__main__":
    main()
