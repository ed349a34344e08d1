"""Round-14 pins (grown across the round — don't hardcode a count):
planted-corpus parity tests that exercise NONZERO paths the clean
driver fixtures leave vacuous (encoding damage / Page's L ties /
Luhn checksums / language-ID markers — each builds a tiny parquet
corpus with the structure PLANTED, then runs the real registry query
AND its DuckDB oracle on it), plus semantic pins the oracle can't
express (Cliff's delta full-dominance identity, the band-planning
s-curve chains vs the textbook formula, IVF recall monotonicity in
nprobe, Mendenhall share normalization, Burrows' Delta zero on
identical distributions).
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


def test_cliffs_delta_planted_full_dominance(spark, tmp_path):
    """All purchase values above all view values → δ = +1 exactly,
    zero tied pairs, magnitude 'large'; and gt+lt+tied = n_a·n_b."""
    from ibd_pipeline_spark.queries import all_queries

    rows = []
    eid = 0
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for v in (10.0, 11.0, 12.0):
        eid += 1
        rows.append((eid, ts, eid, "purchase", v, "{}"))
    for v in (1.0, 2.0):
        eid += 1
        rows.append((eid, ts, eid, "view", v, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(f"{tmp_path}/events.parquet")
    (r,) = all_queries()["stats_cliffs_delta"](spark, str(tmp_path)).collect()
    got = dict(zip(r.__fields__, r))
    assert got["gt_pairs"] == 6 and got["lt_pairs"] == 0
    assert got["tied_pairs"] == 0
    assert got["cliffs_delta"] == 1.0
    assert got["magnitude"] == "large"
    assert got["gt_pairs"] + got["lt_pairs"] + got["tied_pairs"] == (
        got["n_a"] * got["n_b"]
    )


def test_lsh_band_planning_scurve_chains():
    """The repeated-squaring expression chains must equal the
    textbook 1-(1-s^r)^b, and expected recall must be monotone in s
    and hit the endpoints exactly (s=0 → 0, s=1 → 1)."""
    from ibd_pipeline_spark.queries.dedup_eval import (
        _BAND_CONFIGS,
        _BAND_THRESH,
        _band_planning_oracle,
    )
    import duckdb

    con = duckdb.connect()
    for b, r in _BAND_CONFIGS:
        # replicate the SQL chain on a literal s column
        sql = _band_planning_oracle()
        # exactness of the threshold literal
        assert abs(_BAND_THRESH[(b, r)] - (1.0 / b) ** (1.0 / r)) < 5e-7
        for s in (0.0, 0.3, 0.5, 0.8, 1.0):
            import re as _re

            m = _re.search(
                rf"CAST\(ROUND\((.+?), 9\) AS DECIMAL\(28,9\)\) AS p_{b}_{r}",
                sql,
            )
            expr = m.group(1)
            (got,) = con.execute(
                f"SELECT {expr} FROM (SELECT CAST({s} AS DOUBLE) AS s)"
            ).fetchone()
            want = 1.0 - (1.0 - s**r) ** b
            assert abs(got - want) < 1e-12, (b, r, s, got, want)
    con.close()


def test_ivf_recall_curve_monotone(spark, sf_dir):
    """More probes can only help: recall@10 and candidate counts must
    be non-decreasing in nprobe, with recall in [0, 1]."""
    from ibd_pipeline_spark.queries import all_queries

    rows = (
        all_queries()["similarity_ivf_recall_curve"](spark, sf_dir)
        .orderBy("nprobe")
        .collect()
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    recs = [r["recall_at_10"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert all(0.0 <= x <= 1.0 for x in recs)
    assert recs == sorted(recs)
    assert cands == sorted(cands)


def test_mendenhall_shares_sum_to_one(spark, sf_dir):
    """Per-source word-length shares must sum to 1 (6-decimal
    rounding tolerance x 13 buckets)."""
    from collections import defaultdict

    from ibd_pipeline_spark.queries import all_queries

    rows = all_queries()["text_mendenhall_word_length"](
        spark, sf_dir
    ).collect()
    per = defaultdict(float)
    for r in rows:
        per[r["source"]] += r["share"]
    assert per and all(abs(v - 1.0) < 13 * 5e-7 for v in per.values()), per


def test_burrows_delta_identical_sources_zero(spark, tmp_path):
    """Two sources with identical word distributions must measure
    Δ = 0; a third, different source must measure Δ > 0 from both."""
    from ibd_pipeline_spark.queries import all_queries

    base = "the cat sat on the mat and the dog ran off"
    alt = "quantum flux capacitors resonate beyond manifold spectra"
    rows = [
        (1, base, "en", "src_a", len(base)),
        (2, base, "en", "src_b", len(base)),
        (3, alt, "en", "src_c", len(alt)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    out = {
        (r["source_a"], r["source_b"]): r["burrows_delta"]
        for r in all_queries()["text_burrows_delta"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("src_a", "src_b")] == 0.0
    assert out[("src_a", "src_c")] > 0.0
    assert out[("src_a", "src_c")] == out[("src_b", "src_c")]


def test_langid_confusion_planted_markers(spark, tmp_path):
    """Plant real marker characters for each language class and pin
    the per-class recoveries (diagonal) plus one deliberate
    mislabel (labeled de, French text -> off-diagonal cell)."""
    from ibd_pipeline_spark.queries import all_oracles, all_queries

    rows = [
        (1, "plain ascii text", "en", "web", 16),
        (2, "你好 世界", "zh", "web", 5),
        (3, "¿cómo estás señor?", "es", "web", 18),
        (4, "être déjà là", "fr", "web", 12),
        (5, "straße größe", "de", "web", 12),
        (6, "château français", "de", "web", 16),  # mislabeled on purpose
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    q = all_queries()["text_langid_confusion_eval"]
    sdf = q(spark, str(tmp_path))
    got = {(r["labeled_lang"], r["predicted_lang"]): r["n_docs"] for r in sdf.collect()}
    assert got[("en", "en")] == 1
    assert got[("zh", "zh")] == 1
    assert got[("es", "es")] == 1
    assert got[("fr", "fr")] == 1
    assert got[("de", "de")] == 1
    assert got[("de", "fr")] == 1  # the planted mislabel lands off-diagonal
    cols, d_rows = _oracle_on(
        str(tmp_path), all_oracles()["text_langid_confusion_eval"]
    )
    s_rows = {tuple(r) for r in sdf.collect()}
    assert s_rows == {tuple(r) for r in d_rows}
