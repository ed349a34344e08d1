"""SURVEY §2.2 ↔ registry mapping invariants (VERDICT r8 #8): the
row→query map must be total (zero unmapped survey rows), the curated
entries must name real registry queries, and every registry query must
belong to at least one §2.2 row — so COVERAGE.md's survey_row column
is mechanically verifiable, not prose. Pure bookkeeping, no Spark."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import os

os.chdir(REPO)  # survey_rows() reads SURVEY.md relative to cwd

from coverage_map import SURVEY_ROW_QUERIES, survey_row_map  # noqa: E402

from ibd_pipeline_spark.queries import all_queries  # noqa: E402


def test_every_survey_row_maps_to_queries():
    rm = survey_row_map(set(all_queries()))
    assert len(rm) >= 122, f"SURVEY §2.2 shrank? {len(rm)} rows parsed"
    unmapped = [cell for cell, qs in rm.items() if not qs]
    assert unmapped == [], f"§2.2 rows with no mapped query: {unmapped}"


def test_curated_entries_exist_in_registry():
    names = set(all_queries())
    stale = [
        q
        for qs in SURVEY_ROW_QUERIES.values()
        for q in qs
        if not q.startswith("streaming:") and q not in names
    ]
    assert stale == [], f"curated survey-row entries not in registry: {stale}"


def test_every_query_belongs_to_a_survey_row():
    names = set(all_queries())
    rm = survey_row_map(names)
    mapped = {q for qs in rm.values() for q in qs}
    orphans = sorted(n for n in names if n not in mapped)
    assert orphans == [], (
        f"registry queries in no §2.2 row (add to SURVEY_ROW_QUERIES "
        f"or name them in a SURVEY row): {orphans}"
    )


def test_curated_rows_exist_in_survey():
    rm = survey_row_map(set(all_queries()))
    ghost = [cell for cell in SURVEY_ROW_QUERIES if cell not in rm]
    assert ghost == [], f"curated keys match no SURVEY §2.2 row: {ghost}"
