"""Attestation-rotation invariants (VERDICT r8 "Next round" #1 & #3).

The round-8 lesson: oracle upgrades must re-queue attestation
automatically. These tests bind the hand-pinned rotation prefix in
queries/__init__.py to the mechanical computation in
tools/attestation_status.py so staleness can't recur silently:

1. every query the tool says needs (re-)attestation sits INSIDE the
   next driver window (first 50 registry entries);
2. no oracle-backed query's newest driver row may say `no_oracle`
   unless the rotation already queues it for re-attestation;
3. the pinned _ROUND9_PRIORITY equals the tool's computed work-list
   (set-wise), so the prefix is generated, not remembered.

Pure bookkeeping — no SparkSession needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from attestation_status import WINDOW, needs_attestation  # noqa: E402

from ibd_pipeline_spark.queries import all_queries  # noqa: E402


def _pending() -> list[str]:
    work = needs_attestation()
    return work["never"] + work["stale"] + work["failed"]


def test_every_pending_query_inside_driver_window():
    names = list(all_queries())
    window = set(names[:WINDOW])
    outside = [n for n in _pending() if n not in window]
    assert outside == [], (
        f"{len(outside)} queries need attestation but sit outside the "
        f"{WINDOW}-slot driver window — rotate them into the registry "
        f"prefix (queries/__init__.py): {outside}"
    )


def test_no_silently_stale_oracle_rows():
    work = needs_attestation()
    names = list(all_queries())
    window = set(names[:WINDOW])
    silent = [n for n in work["stale"] if n not in window]
    assert silent == [], (
        "oracle-backed queries whose newest driver row predates their "
        f"oracle must be queued for re-attestation: {silent}"
    )


def test_pinned_rotation_matches_computed():
    from ibd_pipeline_spark.queries import (
        _ROUND13_NEW,
        _ROUND13_PRIORITY,
        _ROUND14_NEW,
        _ROUND14_PRIORITY,
        _ROUND15_NEW,
        _ROUND15_PRIORITY,
    )

    computed = set(_pending())
    pinned = (
        set(_ROUND15_PRIORITY)
        | set(_ROUND15_NEW)
        | set(_ROUND14_PRIORITY)
        | set(_ROUND14_NEW)
        | set(_ROUND13_PRIORITY)
        | set(_ROUND13_NEW)
    )
    # The pinned list must cover everything computed; it may carry
    # extra re-attest entries (deliberate re-runs after rewrites).
    missing = computed - pinned
    assert missing == set(), (
        f"attestation work-list drifted — add to _ROUND15_PRIORITY "
        f"(or _ROUND15_NEW): {sorted(missing)}"
    )
