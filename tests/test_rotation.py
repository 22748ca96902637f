"""Guard against driver-window rotation stalls.

The round driver's correctness gate checks only the FIRST 50 entries
of ``queries()``.  Round 3's mistake (VERDICT r3) was rotating zero
never-checked names into that window, so 83/181 queries went three
rounds without a driver verdict despite being locally green.  This
test makes that failure mode self-catching: as long as the registry
contains names that have never appeared in any committed
``CORRECTNESS_r*.json``, the head of the registry must be (almost
entirely) made of them.

Steady state (round 5 onward, once every name has a verdict): the
window is filled by (1) queries added or code-changed in the current
round, then (2) round-robin re-verification of the OLDEST verdicts —
the registry-head comment tracks where the round-robin cursor sits.
With ``never`` empty this test passes on any window by design; the
policy is enforced editorially via the head comment, not this
tripwire.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: How many leading queries() entries the driver verdicts per round.
DRIVER_WINDOW = 50

#: Window slots allowed to hold already-verdicted names (deliberate
#: re-checks of changed implementations are legitimate window uses).
RECHECK_SLACK = 5


def _ever_verdicted() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            names |= set(json.load(fh))
    return names


def test_driver_window_rotates_never_checked_queries():
    import __spark_entry__ as entry

    registry = list(entry.queries())
    checked = _ever_verdicted()
    assert checked, "no CORRECTNESS_r*.json committed — cannot audit rotation"

    never = [q for q in registry if q not in checked]
    window = registry[:DRIVER_WINDOW]
    fresh_in_window = [q for q in window if q not in checked]

    # Required fresh slots: everything still unverdicted, up to the
    # window size minus the re-check allowance.  Once every query has
    # a verdict, `never` is empty and any window passes.
    required = min(len(never), DRIVER_WINDOW - RECHECK_SLACK)
    assert len(fresh_in_window) >= required, (
        f"rotation stall: only {len(fresh_in_window)} of the first "
        f"{DRIVER_WINDOW} queries() entries are never-driver-checked, "
        f"but {len(never)} unverdicted queries exist — move them to the "
        f"dict head (stalled repeats: "
        f"{[q for q in window if q in checked][:10]})"
    )


def test_round5_tail_documented_in_registry_head():
    """The registry's head comment must enumerate the next-round
    queue whenever unverdicted queries remain below the window."""
    import __spark_entry__ as entry

    registry = list(entry.queries())
    checked = _ever_verdicted()
    never_below = [
        q for q in registry[DRIVER_WINDOW:] if q not in checked
    ]
    if not never_below:
        return  # fully rotated — nothing to document
    with open(os.path.join(REPO, "__spark_entry__.py")) as fh:
        src = fh.read()
    assert "ROUND-5 TAIL" in src or "NEXT-ROUND TAIL" in src, (
        "registry head comment no longer documents the queued "
        "never-checked names for the next round"
    )
