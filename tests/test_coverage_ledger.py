"""Static guards for the COVERAGE.md driver-verification ledger and the
driver window (VERDICT r5 #5): commit 5cd00bc repaired 12 ledger rows that
hand-edits had silently dropped when the table renumbered — these tests
make the repair permanent by failing whenever the committed table drifts
from the registry or the renderer, and by pinning the window invariants
the rotation policy promises."""

from __future__ import annotations

import re
from pathlib import Path

from purescript_ifrit_spark.suite import _DRIVER_WINDOW_R7, REGISTRY
from purescript_ifrit_spark.suite._ledger import (
    DRIVER_HISTORY,
    render_ledger_table,
)

COVERAGE = Path(__file__).resolve().parents[1] / "COVERAGE.md"


def _committed_table_rows() -> list:
    rows = []
    for line in COVERAGE.read_text().split("\n"):
        m = re.match(r"\| (\d+) \| `([^`]+)` \| ([^|]+) \| ([^|]+) \|", line)
        if m:
            rows.append(
                (int(m.group(1)), m.group(2), m.group(3).strip(),
                 m.group(4).strip())
            )
    return rows


def test_ledger_history_covers_registry_exactly():
    # every registry entry has a history row and vice versa — the r5
    # failure mode (silently dropped rows) becomes a hard test failure
    assert set(DRIVER_HISTORY) == set(REGISTRY)


def test_committed_ledger_table_matches_renderer():
    # COVERAGE.md's table must be the renderer's output byte-for-byte —
    # hand-edits against a renumbered table can no longer silently no-op
    committed = COVERAGE.read_text()
    assert render_ledger_table() in committed


def test_committed_ledger_positions_match_registry_order():
    rows = _committed_table_rows()
    names = list(REGISTRY)
    assert len(rows) == len(names)
    for pos, name, check, hist in rows:
        assert names[pos] == name, (pos, name, names[pos])
        want_check = "oracle" if REGISTRY[name][1] else "rows-only"
        assert check == want_check, (name, check, want_check)


def test_driver_window_is_exactly_fifty_oracle_entries():
    # the driver checks the FIRST 50 — all 50 slots must be spendable on
    # hash-green outcomes (no rows-only entries per the rotation policy)
    assert len(_DRIVER_WINDOW_R7) == 50
    assert len(set(_DRIVER_WINDOW_R7)) == 50
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW_R7
    rows_only = [n for n in _DRIVER_WINDOW_R7 if REGISTRY[n][1] is None]
    assert rows_only == []


def _checked_rounds(hist: str) -> list:
    # "new rN" marks creation, not a driver check; plain rN tokens are
    # the recorded driver rounds
    return [int(x) for x in re.findall(r"\br(\d+)\b", re.sub(r"new r\d+", "", hist))]


def test_window_prioritizes_never_verified_oracle_entries():
    # every oracle-backed entry whose history has no driver round yet
    # must be IN the window — or, once the window saturated with
    # never-checked entries (session 3), pinned in the declared r8
    # queue head. Either way, no entry silently leaves the rotation.
    from purescript_ifrit_spark.suite import _R8_QUEUE_HEAD

    never = [
        name
        for name, (check, hist) in DRIVER_HISTORY.items()
        if check == "oracle" and not _checked_rounds(hist)
    ]
    missing = [
        n for n in never
        if n not in _DRIVER_WINDOW_R7 and n not in _R8_QUEUE_HEAD
    ]
    assert missing == [], missing
    # the queue is real: disjoint from the window, oracle-backed,
    # registry-resident, never-checked
    for n in _R8_QUEUE_HEAD:
        assert n in REGISTRY and REGISTRY[n][1] is not None, n
        assert n not in _DRIVER_WINDOW_R7, n
        assert not _checked_rounds(DRIVER_HISTORY[n][1]), n


def test_window_repairs_the_r3_stale_cohort_first():
    # VERDICT r6 #1: the seven entries whose last hard check was round 3
    # hold the window's FIRST seven slots — the rotation-invariant repair
    # is position-pinned so late additions cannot displace it
    stale = [
        "x_anti_join",
        "x_semi_join",
        "x_set_ops",
        "x_multimodal_framesample",
        "x_streaming_windowed",
        "x_streaming_session",
        "x_streaming_state",
    ]
    assert _DRIVER_WINDOW_R7[:7] == stale
    for name in stale:
        assert max(_checked_rounds(DRIVER_HISTORY[name][1])) == 3


def test_window_backfill_leaves_no_entry_older_than_r4():
    # after the r7 window lands, every oracle entry NOT in the window
    # must have a last check of r5 or r6 — the backfill composition
    # covers the whole r4 cohort except the tail displaced by new
    # r7 entries (those r4-tail entries must still be windowed or r4)
    from purescript_ifrit_spark.suite import _R8_QUEUE_HEAD

    for name, (check, hist) in DRIVER_HISTORY.items():
        if (check != "oracle" or name in _DRIVER_WINDOW_R7
                or name in _R8_QUEUE_HEAD):
            continue
        rounds = _checked_rounds(hist)
        assert rounds and max(rounds) >= 4, (name, hist)


def test_bench_loads_every_table_it_references():
    """Static guard for the r7 defect class: a bench extra referenced
    t["part"] but the loader tuple was never extended, so every full
    bench run crashed with KeyError before emitting JSON."""
    import re

    src = (COVERAGE.parent / "bench.py").read_text()
    loaded = set(re.findall(r'"(\w+)"', src.split("t = {", 1)[1].split("}", 1)[0]))
    referenced = set(re.findall(r'\bt\["(\w+)"\]', src))
    missing = referenced - loaded
    assert not missing, f"bench references unloaded tables: {sorted(missing)}"
