"""Rotation discipline for the driver's 50-query correctness window.

The driver checks only the FIRST 50 ``queries()`` entries per round, so
with ~145 queries full re-verification takes ceil(N/50) = 3 rounds. These
tests turn that schedule into enforced invariants (VERDICT r03 #1 /
r04 #3) instead of a comment:

1. every query has SOME driver row, sits in the current window, or is
   explicitly ledgered as new;
2. the window is a true ROTATION: never-checked queries first, then the
   stalest (no query outside the window may be strictly staler than the
   staleness tier the window is drawn from);
3. staleness is bounded: every query was verified within the last
   ceil(N/50) rounds, is in the current window, or is queued in the block
   directly below position 50 (the next round's window).

No Spark session — dict/JSON only.
"""

import json
import math
import os

import __spark_entry__ as e

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

# Entries added mid-round, awaiting their first driver run. The r05-new
# operators lead the current window, so nothing is pending.
PENDING_NEXT_ROTATION: set = set()


def _last_rounds() -> dict:
    """query -> newest round with a driver row (absent = never checked)."""
    last = {}
    for fn in os.listdir(HERE):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            r = int(fn[len("CORRECTNESS_r"):-len(".json")])
            for k in json.load(open(os.path.join(HERE, fn))):
                last[k] = max(last.get(k, 0), r)
    return last


def test_every_query_is_driver_checked_or_ledgered():
    names = list(e.queries())
    window = set(names[:WINDOW])
    covered = set(_last_rounds()) | window | PENDING_NEXT_ROTATION
    missing = [n for n in names if n not in covered]
    assert not missing, (
        f"queries() entries with NO driver row, outside the {WINDOW}-entry "
        f"window, and not ledgered: {missing}")


def test_pending_set_matches_reality():
    names = set(e.queries())
    assert PENDING_NEXT_ROTATION <= names
    stale = PENDING_NEXT_ROTATION & set(_last_rounds())
    assert not stale, f"ledgered-as-pending but already driver-checked: {stale}"


def test_window_is_a_rotation_of_the_stalest():
    """Never-checked queries must ALL be in the window; beyond those, the
    window must be drawn from the stalest tiers — any query strictly
    staler than the window's staleness threshold that is left outside
    breaks the rotation."""
    names = list(e.queries())
    window = set(names[:WINDOW])
    last = _last_rounds()
    never = [n for n in names if n not in last]
    out = [n for n in never if n not in window]
    assert not out, f"never-driver-checked queries outside the window: {out}"
    # the 50th-stalest last-round is the tier the window is drawn from;
    # everything strictly staler must be inside
    ages = sorted(last.get(n, -1) for n in names)
    threshold = ages[min(WINDOW, len(names)) - 1]
    must_be_in = [n for n in names
                  if last.get(n, -1) < threshold and n not in window]
    assert not must_be_in, (
        f"queries staler than the window tier (last round < {threshold}) "
        f"left outside the window: {must_be_in}")


def test_staleness_is_bounded():
    """Every query: verified within the last ceil(N/50) rounds, OR in the
    current window (verified next round), OR queued directly below
    position 50 (verified the round after) — the steady-state guarantee
    that no driver row goes stale beyond one rotation cycle."""
    names = list(e.queries())
    last = _last_rounds()
    if not last:
        return
    newest = max(last.values())
    cycle = math.ceil(len(names) / WINDOW)
    window = set(names[:WINDOW])
    next_window = set(names[WINDOW:2 * WINDOW])
    stale = [n for n in names
             if last.get(n, newest) <= newest - cycle
             and n not in window and n not in next_window]
    assert not stale, (
        f"queries with driver rows older than {cycle} rounds, neither in "
        f"the current window nor queued for the next: {stale}")


def test_no_duplicate_query_keys():
    """The rotation moves entries between the window and the tail; a key
    accidentally left in both places silently shadows (dict literal keeps
    the LAST) and shrinks the effective window."""
    import ast, inspect
    src = inspect.getsource(e.queries)
    d = next(n for n in ast.walk(ast.parse(src)) if isinstance(n, ast.Dict))
    keys = [k.value for k in d.keys]
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate queries() keys: {dupes}"
