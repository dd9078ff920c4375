"""Mechanical conformance check for the gate-window rotation schedule.

The driver's correctness gate runs the first 50 entries of
``__spark_entry__.queries()``. Those 50 are produced by
``gate_window()`` — pinned repays plus stalest-first over the
oracle-backed registry — parameterized by the committed
``_GATE_LAST_ROUND`` table. This tool re-derives everything from the
committed artifacts so the schedule is auditable without trusting the
table:

1. Regenerates query -> last-gated-round from the CORRECTNESS_r*.json
   files for rounds BEFORE ``CURRENT_ROUND`` and fails on any drift
   from the ``_GATE_LAST_ROUND`` literal (``--emit`` prints the
   regenerated literal for the next round's bump).
2. Asserts ``queries()`` leads with exactly the scheduled window.
3. Projects future rounds until every oracle-backed row has been
   gated, printing the guaranteed re-entry bound K.

Usage: python tools/check_gate_schedule.py [--emit]
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def regenerate_history(current_round: int) -> dict[str, int]:
    hist: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd >= current_round:
            continue  # artifacts of the in-flight round don't count yet
        with open(f) as fh:
            for name in json.load(fh):
                hist[name] = max(hist.get(name, 0), rnd)
    return hist


def emit_literal(hist: dict[str, int], order: list[str]) -> str:
    pos = {n: i for i, n in enumerate(order)}
    items = sorted(hist.items(), key=lambda kv: pos.get(kv[0], 10**9))
    lines, cur = [], "    "
    for n, r in items:
        tok = f'"{n}": {r}, '
        if len(cur) + len(tok) > 78:
            lines.append(cur.rstrip())
            cur = "    "
        cur += tok
    lines.append(cur.rstrip())
    return "\n".join(lines)


def main() -> int:
    import __spark_entry__ as entry

    reg = list(entry._registry())
    ob = set(entry.oracle_sql())
    hist = regenerate_history(entry.CURRENT_ROUND)

    if "--emit" in sys.argv:
        print(emit_literal(hist, reg))
        return 0

    ok = True
    if hist != entry._GATE_LAST_ROUND:
        ok = False
        extra = set(entry._GATE_LAST_ROUND) - set(hist)
        missing = set(hist) - set(entry._GATE_LAST_ROUND)
        diff = {
            n: (hist.get(n), entry._GATE_LAST_ROUND.get(n))
            for n in set(hist) | set(entry._GATE_LAST_ROUND)
            if hist.get(n) != entry._GATE_LAST_ROUND.get(n)
        }
        print(f"FAIL history drift: {diff} (extra={extra} missing={missing})")
        print("run with --emit to print the regenerated literal")

    window = entry.gate_window(reg, ob)
    lead = list(entry.queries())[: len(window)]
    if lead != window:
        ok = False
        print("FAIL queries() does not lead with the scheduled window")
    if len(window) != entry._GATE_WINDOW_SIZE:
        ok = False
        print(f"FAIL window size {len(window)}")
    if not set(window) <= ob:
        ok = False
        print(f"FAIL non-oracle rows in window: {set(window) - ob}")
    for p in entry._GATE_PINNED.get(entry.CURRENT_ROUND, ()):
        if p not in window:
            ok = False
            print(f"FAIL pinned row {p} missing from window")

    # projection: how many rounds until full oracle-backed coverage
    h = dict(hist)
    seen: set[str] = set()
    target = {n for n in reg if n in ob}
    k = 0
    for rnd in range(entry.CURRENT_ROUND, entry.CURRENT_ROUND + 10):
        w = entry.gate_window(reg, ob, round_=rnd, history=h)
        for n in w:
            h[n] = rnd
        seen |= set(w)
        k += 1
        if seen >= target:
            break
    if seen >= target:
        print(
            f"window r{entry.CURRENT_ROUND}: {len(window)} rows; "
            f"{len(target)} oracle-backed rows all gated within K={k} "
            "rounds"
        )
    else:
        ok = False
        print(f"FAIL coverage incomplete after 10 rounds: {target - seen}")

    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
