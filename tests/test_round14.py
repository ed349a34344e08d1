"""Round-14 pins: planted-damage parity for the encoding audit (the
clean driver corpus makes its zeros vacuous — ADVICE r13 #1), and the
Page's L mid-rank tie convention (ADVICE r13 #2: the old treatment-
order tiebreak inflated L toward the alternative). Each test builds a
tiny parquet corpus with the structure PLANTED, then runs the real
registry query AND its DuckDB oracle on that corpus — full engine
parity on nonzero counts, not just the clean-fixture zeros.
"""

from __future__ import annotations

import datetime


def _oracle_on(tmp_sf, sql):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        p = f"{tmp_sf}/{t}.parquet"
        import os

        # Spark writes a DIRECTORY named <t>.parquet — glob inside it
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
    finally:
        con.close()
    return cols, rows


def test_encoding_damage_planted_parity(spark, tmp_path):
    """Plant real U+FFFD replacement chars, C0 controls, AND the
    mojibake three-char string 'ï¿½' (which must count as damage on
    NEITHER engine — it is valid text, not a replacement char; the
    RE2 byte-spelling bug the r13 oracle had would have counted it)
    then assert Spark == DuckDB with NONZERO damage counts."""
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    rows = [
        (1, "clean text here", "en", "web", 15),
        (2, "bad � byte �� here", "en", "web", 20),
        (3, "ctrl\x01and\x1fjunk", "en", "crawl", 13),
        (4, "mojibake ï¿½ looks damaged but is text", "en", "crawl", 42),
        (5, "tab\tand\nnewline are exempt", "en", "web", 26),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    tmp_sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{tmp_sf}/documents.parquet")

    q = all_queries()["quality_encoding_damage"]
    sdf = q(spark, tmp_sf)
    s_rows = {tuple(r) for r in sdf.collect()}
    cols, d_rows = _oracle_on(tmp_sf, all_oracles()["quality_encoding_damage"])
    assert sorted(sdf.columns) == sorted(cols)
    assert s_rows == {tuple(r) for r in d_rows}

    by_src = {r[0]: dict(zip(sdf.columns, r)) for r in s_rows}
    # web: doc 2 has exactly 3 replacement chars; docs 1/5 clean
    assert by_src["web"]["replacement_chars"] == 3
    assert by_src["web"]["control_chars"] == 0
    assert by_src["web"]["damaged_docs"] == 1
    # crawl: doc 3 has 2 control chars; doc 4's mojibake string is
    # NOT damage on either engine (the r13 oracle bug would have
    # counted it as one replacement char)
    assert by_src["crawl"]["replacement_chars"] == 0
    assert by_src["crawl"]["control_chars"] == 2
    assert by_src["crawl"]["damaged_docs"] == 1


def test_page_trend_midranks_on_planted_ties(spark, tmp_path):
    """Plant EXACT ties in cell means (view == click in every block)
    and pin the Friedman mid-rank convention: tied treatments share
    rank 1.5, so L = b·(1·1.5 + 2·1.5 + 3·3) = 13.5·b — a
    half-integer, impossible under any deterministic tiebreak (the
    old treatment-order rule gave 14·b, biased toward the
    alternative). Spark and the DuckDB oracle must agree exactly."""
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    rows = []
    eid = 0
    # four blocks = Mon..Thu 2024-01-01..04 (isodow 1..4)
    for day in range(1, 5):
        ts = datetime.datetime(2024, 1, day, 12, 0, 0)
        for et, vals in (
            ("view", [2.0, 2.0]),
            ("click", [1.0, 3.0]),  # same mean 2.0 -> exact tie
            ("purchase", [5.0, 7.0]),
        ):
            for v in vals:
                eid += 1
                rows.append((eid, ts, eid % 3, et, v, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    tmp_sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{tmp_sf}/events.parquet")

    q = all_queries()["stats_page_trend_test"]
    sdf = q(spark, tmp_sf)
    (row,) = sdf.collect()
    got = dict(zip(sdf.columns, row))
    assert got["n_blocks"] == 4 and got["n_treatments"] == 3
    assert got["page_l"] == 13.5 * 4  # mid-ranks, NOT 14*4

    cols, d_rows = _oracle_on(tmp_sf, all_oracles()["stats_page_trend_test"])
    (d_row,) = d_rows
    d_got = dict(zip(cols, d_row))
    for k in ("n_blocks", "n_treatments", "page_l", "z_stat", "p_one_sided"):
        assert got[k] == d_got[k], (k, got[k], d_got[k])


def test_luhn_card_audit_planted(spark, tmp_path):
    """Plant one Luhn-VALID card number, one single-digit-off invalid
    sibling, a short digit run (no candidate), and an 11-digit number
    (below the 13-digit floor) — Spark and the DuckDB oracle must
    agree with NONZERO counts, and only the valid number may count."""
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    rows = [
        (1, "pay 4532015112830366 today", "en", "web", 25),
        (2, "typo 4532015112830367 here", "en", "web", 25),
        (3, "order 12345 is short", "en", "crawl", 20),
        (4, "phone 79927398713 is 11 digits", "en", "crawl", 30),
        (5, "amex 371449635398431 works", "en", "web", 26),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    tmp_sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{tmp_sf}/documents.parquet")

    q = all_queries()["quality_luhn_card_audit"]
    sdf = q(spark, tmp_sf)
    s_rows = {tuple(r) for r in sdf.collect()}
    cols, d_rows = _oracle_on(tmp_sf, all_oracles()["quality_luhn_card_audit"])
    assert sorted(sdf.columns) == sorted(cols)
    assert s_rows == {tuple(r) for r in d_rows}

    by_src = {r[0]: dict(zip(sdf.columns, r)) for r in s_rows}
    # web: 3 candidates (16,16,15 digits), 2 Luhn-valid (visa + amex)
    assert by_src["web"]["n_candidates"] == 3
    assert by_src["web"]["n_luhn_valid"] == 2
    assert by_src["web"]["docs_with_valid"] == 2
    # crawl: no 13-16 digit run at all
    assert by_src["crawl"]["n_candidates"] == 0
    assert by_src["crawl"]["n_luhn_valid"] == 0
