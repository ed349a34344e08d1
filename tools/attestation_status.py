#!/usr/bin/env python
"""Attestation bookkeeping: which registry queries hold a green driver
row in some CORRECTNESS_r{N}.json, which sit in the upcoming driver
window, and which are queued for a later rotation.

Run from the repo root after each round's artifacts land; the output
is the work-list for the next `_DRIVER_PRIORITY` rotation
(ibd_pipeline_spark/queries/__init__.py).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WINDOW = 50  # the driver attests exactly this many registry-prefix entries


def main() -> None:
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    names = list(all_queries())
    oracles = set(all_oracles())

    green: dict[str, str] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = path.split("_r")[1].split(".")[0]
        for name, row in json.load(open(path)).items():
            # Attested = oracle-green, OR a recorded rows-only run
            # (err == "no_oracle" is how the driver marks a query that
            # registered without an oracle; its spark_rows being
            # present means the run executed and was recorded — the
            # designed outcome for approximate/iterative ops).
            ok = row.get("hash_match") or (
                row.get("rows_match") and not row.get("err")
            ) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok and name not in green:
                green[name] = f"r{rnd}"

    window = names[:WINDOW]
    queued = names[WINDOW:]
    print(f"registry {len(names)} | oracle-backed {len(oracles)} "
          f"| driver-green {len(green)}")
    print(f"\n-- window (next driver run attests these {WINDOW}) --")
    for n in window:
        tag = green.get(n, "PENDING")
        kind = "oracle" if n in oracles else "rows-only"
        print(f"  {n:42s} {kind:9s} {tag}")
    pending_later = [n for n in queued if n not in green]
    print(f"\n-- queued beyond the window, no green row yet "
          f"({len(pending_later)}) --")
    for n in pending_later:
        print(f"  {n}")


if __name__ == "__main__":
    main()
