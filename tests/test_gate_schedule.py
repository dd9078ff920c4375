"""Gate-window rotation schedule conformance (r10, VERDICT r09 #2).

The driver's correctness gate runs the first 50 entries of
``__spark_entry__.queries()``; these tests pin the committed
deterministic schedule that chooses them — no Spark session needed.
``tools/check_gate_schedule.py`` is the same check as a standalone
auditable script (plus ``--emit`` for the next round's history bump).
"""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_history_table_matches_committed_artifacts():
    """_GATE_LAST_ROUND is exactly the reconstruction from the
    committed CORRECTNESS_r*.json files of rounds before
    CURRENT_ROUND — the table cannot silently drift from the audit
    trail. (When a new round's artifact lands, CURRENT_ROUND and the
    table must be bumped together; tools/check_gate_schedule.py
    --emit prints the updated literal.)"""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import check_gate_schedule as cgs
    finally:
        sys.path.pop(0)
    entry = _entry()
    regen = cgs.regenerate_history(entry.CURRENT_ROUND)
    assert regen == entry._GATE_LAST_ROUND


def test_queries_leads_with_scheduled_window():
    entry = _entry()
    reg = list(entry._registry())
    ob = set(entry.oracle_sql())
    window = entry.gate_window(reg, ob)
    assert len(window) == entry._GATE_WINDOW_SIZE
    assert set(window) <= ob  # every gate row carries a value oracle
    assert list(entry.queries())[: len(window)] == window
    # registry and reordered queries() expose the same entries
    assert set(entry.queries()) == set(reg)


def test_pinned_repays_are_in_current_window():
    """VERDICT r09 #1: the six rows the r09 rotation displaced are
    pinned back into the r10 window."""
    entry = _entry()
    window = entry.gate_window(list(entry._registry()), set(entry.oracle_sql()))
    for name in entry._GATE_PINNED.get(entry.CURRENT_ROUND, ()):
        assert name in window, name


def test_every_oracle_backed_row_gated_within_three_rounds():
    """Stalest-first guarantees re-entry within ceil(N/50) rounds;
    with 132 oracle-backed rows that is 3."""
    entry = _entry()
    reg = list(entry._registry())
    ob = set(entry.oracle_sql())
    target = {n for n in reg if n in ob}
    hist = dict(entry._GATE_LAST_ROUND)
    seen: set[str] = set()
    for rnd in range(entry.CURRENT_ROUND, entry.CURRENT_ROUND + 3):
        window = entry.gate_window(reg, ob, round_=rnd, history=hist)
        for n in window:
            hist[n] = rnd
        seen |= set(window)
    assert seen >= target, target - seen


def test_new_operators_enter_next_window():
    """The standing policy — each round's new oracle-backed operators
    enter the gate — falls out of the schedule: a row with no history
    sorts stalest and lands in the next window."""
    entry = _entry()
    reg = list(entry._registry())
    ob = set(entry.oracle_sql())
    fake = "zz_new_operator"
    window = entry.gate_window(reg + [fake], ob | {fake})
    assert fake in window
