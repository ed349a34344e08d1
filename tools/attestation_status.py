#!/usr/bin/env python
"""Attestation bookkeeping: which registry queries hold a green driver
row in some CORRECTNESS_r{N}.json, which need (re-)attestation, and
what the next round's `_ROUND{N}_PRIORITY` rotation prefix must be.

The key rule (round-8 lesson): an oracle UPGRADE re-queues a query.
A query whose latest driver row says `no_oracle` but which now carries
an oracle in `all_oracles()` is STALE — its evidence predates the
oracle and the driver must re-attest it. `needs_attestation()` computes
never-attested + stale + latest-row-failed mechanically; the rotation
list in ibd_pipeline_spark/queries/__init__.py is pinned from this
output and tests/test_attestation.py fails on drift.

Run from anywhere; paths resolve relative to the repo root.
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WINDOW = 50  # the driver attests exactly this many registry-prefix entries


def latest_rows() -> "dict[str, tuple[int, dict]]":
    """name -> (round, row) for the NEWEST driver row per query."""
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(Path(path).name.split("_r")[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            latest[name] = (rnd, row)
    return latest


def _row_green(row: dict, has_oracle: bool) -> bool:
    """Is this driver row adequate evidence for a query TODAY?

    - oracle-backed: hash_match must be true, or rows matched with no
      error (schema-only compare rounds).
    - rows-only by design: a recorded `no_oracle` run with a row count
      is the designed outcome.
    A `no_oracle` row for a query that NOW has an oracle is stale —
    the oracle postdates the evidence.
    """
    if row.get("hash_match"):
        return True
    if row.get("rows_match") and not row.get("err"):
        return True
    if (
        not has_oracle
        and row.get("err") == "no_oracle"
        and row.get("spark_rows") is not None
    ):
        return True
    return False


def needs_attestation() -> "dict[str, list[str]]":
    """Mechanical work-list for the next rotation prefix.

    Returns {"never": [...], "stale": [...], "failed": [...]} in
    registry order. Union = every query whose newest driver evidence
    is absent or inadequate.
    """
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    names = list(all_queries())
    oracles = set(all_oracles())
    latest = latest_rows()

    never = [n for n in names if n not in latest]
    stale = [
        n
        for n in names
        if n in latest
        and n in oracles
        and latest[n][1].get("err") == "no_oracle"
    ]
    failed = [
        n
        for n in names
        if n in latest
        and n not in stale
        and not _row_green(latest[n][1], n in oracles)
    ]
    return {"never": never, "stale": stale, "failed": failed}


def main() -> None:
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    names = list(all_queries())
    oracles = set(all_oracles())
    latest = latest_rows()
    work = needs_attestation()
    pending = work["never"] + work["stale"] + work["failed"]

    green = {
        n: f"r{latest[n][0]:02d}"
        for n in names
        if n in latest and _row_green(latest[n][1], n in oracles)
    }
    print(
        f"registry {len(names)} | oracle-backed {len(oracles)} "
        f"| latest-row green {len(green)} | needs attestation {len(pending)}"
    )
    print(f"\n-- window (next driver run attests these {WINDOW}) --")
    for n in names[:WINDOW]:
        tag = green.get(n, "PENDING")
        kind = "oracle" if n in oracles else "rows-only"
        print(f"  {n:42s} {kind:9s} {tag}")
    outside = [n for n in pending if n not in names[:WINDOW]]
    print(f"\n-- needs attestation but OUTSIDE the window ({len(outside)}) --")
    for n in outside:
        print(f"  {n}  <-- rotate into the prefix")
    print("\n-- recommended _ROUND{N}_PRIORITY (paste into queries/__init__.py) --")
    for n in pending:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
