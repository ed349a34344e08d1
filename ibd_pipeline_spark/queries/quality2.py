"""Data-quality wave 3 (round 5): snapshot diffing — the
"what changed between yesterday's load and today's" readout every
warehouse reconciliation job needs (the batch analog of CDC: given
two full snapshots and a key, classify every key as added / removed /
changed / unchanged WITHOUT any change log).

The 'new' snapshot is derived deterministically inside the query
(md5-gated mutations of the fixture table) so the diff exercises all
four classes and stays oracle-checkable — in production the two
sides are two partitions/paths of the same table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load, load_wide
from ibd_pipeline_spark.queries import query

# Deterministic mutation gates (pure functions of the key, identical
# in both engines): ~5% of rows dropped, ~5% price-bumped, plus a
# shifted-key block of inserts.
_GATE = "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

_DIFF_SQL = f"""
WITH old AS (
  SELECT o_orderkey AS k, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
), new AS (
  SELECT o_orderkey AS k, o_orderstatus,
         CASE WHEN {_GATE} < 5
              THEN o_totalprice + 1000.0 ELSE o_totalprice END
           AS o_totalprice,
         o_orderpriority
  FROM orders
  WHERE {_GATE} >= 95 OR {_GATE} < 90
  UNION ALL
  SELECT o_orderkey + 10000000 AS k, o_orderstatus, o_totalprice,
         o_orderpriority
  FROM orders WHERE {_GATE} = 50
), j AS (
  SELECT COALESCE(o.k, n.k) AS k,
         o.k IS NOT NULL AS in_old,
         n.k IS NOT NULL AS in_new,
         o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
           AS differs
  FROM old o FULL OUTER JOIN new n ON o.k = n.k
)
SELECT CAST(COUNT(*) FILTER (in_old AND NOT in_new) AS BIGINT) AS n_removed,
       CAST(COUNT(*) FILTER (in_new AND NOT in_old) AS BIGINT) AS n_added,
       CAST(COUNT(*) FILTER (in_old AND in_new AND differs) AS BIGINT) AS n_changed,
       CAST(COUNT(*) FILTER (in_old AND in_new AND NOT differs) AS BIGINT)
         AS n_unchanged
FROM j
"""


@query("quality_snapshot_diff", oracle=_DIFF_SQL)
def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-snapshot diff: full-outer join on the business key, then
    classify — removed (old only), added (new only), changed (both
    sides, any non-key column differs under null-safe comparison),
    unchanged. One join, one aggregate; no change log required. The
    null-safe IS DISTINCT FROM spelling (Spark: eqNullSafe) is what
    makes 'changed' correct when a column goes NULL ↔ non-NULL —
    plain <> would silently classify those as unchanged.

    Scale: the canonical reconciliation shape — both snapshots
    shuffle once on the key (or zero times if both are bucketed by
    it, the layout sources/io.py's bucketed writer exists for); the
    per-row compare is codegen. For wide tables, compare a
    precomputed row hash (xxhash64 of the struct) instead of N
    columns — same plan, constant compare cost.
    """
    o = load(spark, sf_dir, "orders")
    gate = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    old = o.select(
        F.col("o_orderkey").alias("k"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    base = o.withColumn("_g", gate)
    new = (
        base.filter((F.col("_g") >= 95) | (F.col("_g") < 90))
        .select(
            F.col("o_orderkey").alias("k"),
            "o_orderstatus",
            # exact double add — a multiplicative bump would need a
            # round(), and rounding a computed double diverges across
            # engines (the registry float contract)
            F.when(F.col("_g") < 5, F.col("o_totalprice") + 1000.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionAll(
            base.filter(F.col("_g") == 50).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    in_old = F.col("o.k").isNotNull()
    in_new = F.col("n.k").isNotNull()
    differs = (
        ~F.col("o.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus"))
        | ~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
        | ~F.col("o.o_orderpriority").eqNullSafe(F.col("n.o_orderpriority"))
    )
    return j.agg(
        F.count(F.when(in_old & ~in_new, 1)).cast("bigint").alias("n_removed"),
        F.count(F.when(in_new & ~in_old, 1)).cast("bigint").alias("n_added"),
        F.count(F.when(in_old & in_new & differs, 1)).cast("bigint").alias("n_changed"),
        F.count(F.when(in_old & in_new & ~differs, 1))
        .cast("bigint")
        .alias("n_unchanged"),
    )


_FRESHNESS_SQL = """
WITH sla(event_type, max_gap_minutes) AS (
  VALUES ('view', 5), ('click', 10), ('purchase', 120),
         ('error', 60), ('signup', 240)
), last_seen AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(ts) AS last_ts
  FROM events GROUP BY 1
), horizon AS (SELECT MAX(ts) AS now_ts FROM events)
SELECT l.event_type, l.n_events,
       CAST(FLOOR(EPOCH((SELECT now_ts FROM horizon))) AS BIGINT)
         - CAST(FLOOR(EPOCH(l.last_ts)) AS BIGINT) AS staleness_seconds,
       CAST(s.max_gap_minutes AS INT) AS sla_minutes,
       (CAST(FLOOR(EPOCH((SELECT now_ts FROM horizon))) AS BIGINT)
         - CAST(FLOOR(EPOCH(l.last_ts)) AS BIGINT)) > s.max_gap_minutes * 60
         AS breached
FROM last_seen l JOIN sla s USING (event_type)
ORDER BY l.event_type
"""


@query("quality_freshness_sla", oracle=_FRESHNESS_SQL)
def quality_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA readout: per event type, seconds since the
    last record relative to the corpus horizon (MAX(ts) — the batch
    stand-in for wall clock, which keeps the query deterministic and
    oracle-checkable), compared against a per-type SLA from an inline
    VALUES dim. The operational page every ingestion pipeline
    publishes; the breach flag is an exact integer comparison.

    Scale: one map-side-combined aggregate per type + a broadcast
    1-row horizon + a 5-row broadcast SLA dim — the events table is
    scanned once, shuffled never (the per-type aggregate's shuffle is
    5 rows).
    """
    ev = load(spark, sf_dir, "events")
    sla = spark.createDataFrame(
        [("view", 5), ("click", 10), ("purchase", 120), ("error", 60),
         ("signup", 240)],
        "event_type string, max_gap_minutes int",
    )
    last_seen = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    horizon = ev.agg(F.max("ts").alias("now_ts"))
    staleness = (
        F.unix_timestamp("now_ts") - F.unix_timestamp("last_ts")
    ).cast("bigint")
    return (
        last_seen.crossJoin(F.broadcast(horizon))
        .join(F.broadcast(sla), "event_type")
        .select(
            "event_type",
            "n_events",
            staleness.alias("staleness_seconds"),
            F.col("max_gap_minutes").cast("int").alias("sla_minutes"),
            (staleness > F.col("max_gap_minutes") * 60).alias("breached"),
        )
        .orderBy("event_type")
    )


_GINI_SQL = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY user_id
), ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         SUM(x) OVER () AS tot
  FROM per_user
), s AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(tot) AS BIGINT) AS tot,
         CAST(SUM(i * x) AS BIGINT) AS weighted
  FROM ranked
)
SELECT n AS n_users, tot AS n_events, weighted,
       CAST(2 * weighted - (n + 1) * tot AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)) AS gini
FROM s
"""


@query("quality_activity_gini", oracle=_GINI_SQL)
def quality_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume — the concentration
    readout ("do 1% of users generate 90% of traffic?") that decides
    whether per-user keys need skew handling at all. Computed from
    the ranked form G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with a total
    ordering (count, then user_id) so ranks are deterministic; every
    accumulator is an exact integer, and the one division at the end
    is a single IEEE op on exact inputs — no rounding needed.

    Scale: one per-user aggregate, then the global rank as a
    distributed row number (operators/ranking.py — range shuffle over
    the per-user frame, never a single-partition sort of the user
    dimension); n and Σx fold into the same final 1-row aggregate.
    """
    from ibd_pipeline_spark.operators.ranking import with_global_row_number

    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    ranked = with_global_row_number(per_user, ["x", "user_id"])
    s = ranked.agg(
        F.max("_n").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("tot"),
        F.sum(F.col("_rn") * F.col("x")).cast("bigint").alias("weighted"),
    )
    return s.select(
        F.col("n").alias("n_users"),
        F.col("tot").alias("n_events"),
        "weighted",
        (
            (2 * F.col("weighted") - (F.col("n") + 1) * F.col("tot")).cast("double")
            / (F.col("n").cast("double") * F.col("tot").cast("double"))
        ).alias("gini"),
    )


_ENTROPY_SQL = """
WITH c AS (
  SELECT o_orderpriority AS v, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(ROUND(SUM(CAST(n * LOG2(CAST(n AS DOUBLE)) AS DECIMAL(28,8))), 6)
              AS DOUBLE) AS sum_nlogn
  FROM c
)
SELECT n_distinct, total,
       ROUND(LOG2(CAST(total AS DOUBLE)) - sum_nlogn / CAST(total AS DOUBLE), 6)
         AS entropy_bits,
       ROUND(LOG2(CAST(n_distinct AS DOUBLE)), 6) AS max_entropy_bits
FROM m
"""


@query("quality_column_entropy", oracle=_ENTROPY_SQL)
def quality_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of a column's value distribution — the
    information-content profile that ranks candidate partition /
    bucketing keys (high entropy spreads; near-zero entropy means a
    constant-ish column) and flags drifting categoricals when
    tracked over time. Computed from exact integer counts via
    H = log₂N − (Σ n·log₂n)/N — one aggregate over the value-count
    frame; each n·log₂n term is cast to decimal per row (the Zipf-fit
    libm discipline: ulp noise sits 8 decimal places below the cast),
    so the sum is order-independent and the rounded output is stable
    across engines.

    Scale: one map-side-combined count aggregate (cardinality =
    distinct values — for genuinely high-cardinality columns swap in
    the HLL sketch and report log₂(est) as the entropy upper bound);
    the entropy fold runs on the count frame.
    """
    o = load(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_orderpriority").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = c.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(
            F.sum(
                (F.col("n") * F.log2(F.col("n").cast("double"))).cast(
                    "decimal(28,8)"
                )
            ),
            6,
        )
        .cast("double")
        .alias("sum_nlogn"),
    )
    return m.select(
        "n_distinct",
        "total",
        F.round(
            F.log2(F.col("total").cast("double"))
            - F.col("sum_nlogn") / F.col("total").cast("double"),
            6,
        ).alias("entropy_bits"),
        F.round(F.log2(F.col("n_distinct").cast("double")), 6).alias(
            "max_entropy_bits"
        ),
    )


# ---------------------------------------------------------------------------
# Ingest-order monotonicity audit: event_id vs event-time (r13)
# ---------------------------------------------------------------------------

_MONO_SQL = """
WITH e AS (
  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
), p AS (
  SELECT a.event_id, a.us AS cur, b.us AS prev
  FROM e a JOIN e b ON b.event_id = a.event_id - 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN cur < prev THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
         CAST(MAX(CASE WHEN cur < prev THEN prev - cur ELSE 0 END)
              AS BIGINT) AS max_backstep_us
  FROM p
)
SELECT n_pairs, n_violations,
       ROUND(CAST(n_violations AS DOUBLE) / n_pairs, 6) AS violation_rate,
       ROUND(CAST(max_backstep_us AS DOUBLE) / 1000000.0, 3)
         AS max_backstep_sec
FROM agg
"""


@query("quality_monotonic_violations", oracle=_MONO_SQL)
def quality_monotonic_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-order monotonicity audit: does event-time move backwards
    between consecutively-ASSIGNED event ids? Every at-least-once
    ingest path reorders under retries/partitions, and this count —
    adjacent-id pairs where ts regresses, plus the worst backstep —
    is the number that sizes your streaming WATERMARK (a 2-minute
    watermark with 5-minute backsteps silently drops data; the
    reference hardcodes 2 min at `spark_processor.py:149` with no
    audit behind it — this query is that audit).

    Exactness: adjacency by id SELF-JOIN (id − 1 equi-join; no global
    sort, no lag window), integer µs comparisons, one division.

    Scale: one id-keyed self-join (both sides partition on the key)
    + a one-row fold; ids are dense by construction here, and a
    sparse id space degrades gracefully (missing neighbors just drop
    out of the pair frame)."""
    ev = load(spark, sf_dir, "events")
    e = ev.select("event_id", F.expr("unix_micros(ts)").alias("us"))
    a, b = e.alias("a"), e.alias("b")
    p = a.join(
        b, F.col("b.event_id") == F.col("a.event_id") - F.lit(1)
    ).select(F.col("a.us").alias("cur"), F.col("b.us").alias("prev"))
    agg = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("cur") < F.col("prev"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
        F.max(
            F.when(
                F.col("cur") < F.col("prev"), F.col("prev") - F.col("cur")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("max_backstep_us"),
    )
    return agg.select(
        "n_pairs",
        "n_violations",
        F.round(
            F.col("n_violations").cast("double") / F.col("n_pairs"), 6
        ).alias("violation_rate"),
        F.round(
            F.col("max_backstep_us").cast("double") / F.lit(1000000.0), 3
        ).alias("max_backstep_sec"),
    )


# ---------------------------------------------------------------------------
# Encoding-damage audit: replacement/control characters per source (r13)
# ---------------------------------------------------------------------------

_ENC_SQL = """
WITH c AS (
  SELECT source,
         CAST(LEN(text) AS BIGINT) AS n_chars,
         CAST(LEN(regexp_extract_all(text, '\\x{FFFD}')) AS BIGINT)
           AS n_repl,
         CAST(LEN(regexp_extract_all(text,
              '[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_ctrl
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_repl) AS BIGINT) AS replacement_chars,
       CAST(SUM(n_ctrl) AS BIGINT) AS control_chars,
       CAST(SUM(CASE WHEN n_repl + n_ctrl > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS damaged_docs,
       ROUND(SUM(CASE WHEN n_repl + n_ctrl > 0 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS damaged_ratio
FROM c GROUP BY source ORDER BY source
"""


@query("quality_encoding_damage", oracle=_ENC_SQL)
def quality_encoding_damage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage audit per source: U+FFFD replacement characters
    (the scar every mis-decoded byte leaves once text is UTF-8) and
    C0 control characters (binary junk that survived extraction;
    tab/newline/CR exempted) — the transcoding-health gate that runs
    BEFORE any text statistic, because mojibake poisons tokenizers
    and dedup alike while looking like valid unicode to every other
    filter. A clean synthetic corpus honestly reports zeros; the
    plumbing is what the oracle pins.

    Exactness: integer regexp counts per doc, integer sums, one
    division. The oracle spells U+FFFD as RE2's code-point escape
    '\\x{FFFD}' — RE2 runs in UTF-8 mode, so the byte-spelling
    '\\xEF\\xBF\\xBD' would match the three CODE POINTS U+00EF
    U+00BF U+00BD (the mojibake string 'ï¿½'), not the replacement
    character; the Spark side matches the literal character. Parity
    on a corpus with REAL damage (not just the vacuous clean-corpus
    zeros) is pinned by tests/test_round14.py's planted-damage
    fixture.

    Scale: per-row codegen regex + one map-side-combined aggregate
    on the source key; text scanned once."""
    d = load_wide(spark, sf_dir, "documents")
    c = d.select(
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        F.regexp_count("text", F.lit("�"))
        .cast("bigint")
        .alias("n_repl"),
        F.regexp_count(
            "text", F.lit("[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]")
        )
        .cast("bigint")
        .alias("n_ctrl"),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_repl").cast("bigint").alias("replacement_chars"),
            F.sum("n_ctrl").cast("bigint").alias("control_chars"),
            F.sum(
                F.when(F.col("n_repl") + F.col("n_ctrl") > 0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("damaged_docs"),
            F.round(
                F.sum(
                    F.when(
                        F.col("n_repl") + F.col("n_ctrl") > 0, 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1)),
                6,
            ).alias("damaged_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Luhn-validated payment-card-number audit (r14)
# ---------------------------------------------------------------------------

_LUHN_SQL = """
WITH m AS (
  SELECT d.source, d.doc_id, u.cand
  FROM documents d,
       unnest(regexp_extract_all(d.text, '[0-9]{13,16}')) AS u(cand)
), v AS (
  SELECT source, doc_id, cand,
    list_sum(list_transform(range(1, strlen(cand) + 1), i ->
      CASE WHEN i % 2 = 1
           THEN CAST(substring(cand, strlen(cand) - i + 1, 1) AS BIGINT)
           ELSE CASE WHEN 2 * CAST(substring(cand, strlen(cand) - i + 1, 1)
                              AS BIGINT) > 9
                     THEN 2 * CAST(substring(cand, strlen(cand) - i + 1, 1)
                                   AS BIGINT) - 9
                     ELSE 2 * CAST(substring(cand, strlen(cand) - i + 1, 1)
                                   AS BIGINT) END
      END)) % 10 = 0 AS valid
  FROM m
), per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_luhn_valid,
         CAST(COUNT(DISTINCT CASE WHEN valid THEN doc_id END) AS BIGINT)
           AS docs_with_valid
  FROM v GROUP BY source
), docs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT d.source, d.n_docs,
       COALESCE(p.n_candidates, 0) AS n_candidates,
       COALESCE(p.n_luhn_valid, 0) AS n_luhn_valid,
       COALESCE(p.docs_with_valid, 0) AS docs_with_valid
FROM docs d LEFT JOIN per p ON p.source = d.source
ORDER BY d.source
"""


@query("quality_luhn_card_audit", oracle=_LUHN_SQL)
def quality_luhn_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-card-number PII audit per source: 13–16-digit runs are
    candidates; each is validated with the REAL Luhn mod-10 checksum
    (double every second digit from the right, subtract 9 above 9) —
    the check that separates random digit runs (1-in-10 pass rate)
    from actual card numbers, i.e. the difference between a noisy
    regex alarm and a reportable PII incident. Complements
    text_pii_redaction (which masks) by MEASURING the exposure — the
    audit row a 100 TB-corpus compliance pass publishes.

    A clean synthetic corpus honestly reports zero candidates; the
    checksum plumbing is pinned with planted valid/invalid numbers in
    tests/test_round14.py (the encoding-damage precedent). Boundary
    convention: runs longer than 16 digits contribute their leftmost-
    greedy 16-digit prefix — identical non-overlapping matching in
    both regex engines (RE2 has no lookbehind, so no word-boundary
    guard; documented, not hidden).

    Exactness: the checksum is pure integer arithmetic via a
    higher-order transform over character positions; counts are exact
    BIGINTs; no floats anywhere.

    Scale: per-row codegen regex + one explode bounded by candidate
    count (rare by construction) + a map-side-combined groupBy on
    source; text scanned once."""
    d = load_wide(spark, sf_dir, "documents")
    m = d.select(
        "source",
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit("[0-9]{13,16}"), 0)
        ).alias("cand"),
    )
    digit = lambda i: F.substring(  # noqa: E731
        F.col("cand"), F.length("cand") - i + 1, 1
    ).cast("long")
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.length("cand")),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(i % 2 == 1, digit(i)).otherwise(
            F.when(2 * digit(i) > 9, 2 * digit(i) - 9).otherwise(
                2 * digit(i)
            )
        ),
    )
    v = m.select("source", "doc_id", (luhn_sum % 10 == 0).alias("valid"))
    per = v.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("valid"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_luhn_valid"),
        F.countDistinct(F.when(F.col("valid"), F.col("doc_id")))
        .cast("bigint")
        .alias("docs_with_valid"),
    )
    docs = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        docs.join(per, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_luhn_valid", F.lit(0)).alias("n_luhn_valid"),
            F.coalesce("docs_with_valid", F.lit(0)).alias(
                "docs_with_valid"
            ),
        )
        .orderBy("source")
    )
