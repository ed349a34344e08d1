"""Behavioral analytics, wave 3 (round 5): strict-order funnel
matching — the MATCH_RECOGNIZE-class question ("users who did A, then
B after A, then C after B") that conditional aggregation
(funnel_signup_purchase) cannot answer, because it ignores ORDER.

Reference parity note: no analog in the reference engine; SURVEY.md
§2.2 event-analytics family.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel,
       CAST((SELECT SUM(CAST(FLOOR(EPOCH(p.t3)) AS BIGINT)
                        - CAST(FLOOR(EPOCH(v.t1)) AS BIGINT))
             FROM p JOIN v ON p.user_id = v.user_id) AS BIGINT)
         AS total_convert_seconds
"""


@query("events_funnel_ordered_steps", oracle=_FUNNEL_SQL)
def events_funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view → click → purchase: a click counts
    only if it happens AFTER the user's first view, a purchase only
    AFTER that qualifying click. Three stage aggregates, each the
    minimal event time satisfying the previous stage's anchor —
    the per-stage MIN is what makes the match semantics 'earliest
    qualifying path', the standard funnel definition.

    Conversion time is emitted as total SECONDS (exact integer sum of
    epoch differences) — no float anywhere.

    Scale: every aggregate and join keys on user_id, so AQE coalesces
    them onto one co-partitioned layout — the whole funnel is ONE
    logical shuffle of events by user plus per-user state the size of
    one timestamp per stage. Adding stages extends the chain without
    changing the shuffle count; a time-boxed variant (convert within
    N hours) adds a predicate, not a join.
    """
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    conv = p.join(v, "user_id").agg(
        F.sum(
            (F.unix_timestamp("t3") - F.unix_timestamp("t1")).cast("bigint")
        ).alias("total_convert_seconds")
    )
    counts = (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked_after_view"))
        )
        .crossJoin(p.agg(F.count(F.lit(1)).cast("bigint").alias("n_full_funnel")))
    )
    return counts.crossJoin(
        conv.select(F.col("total_convert_seconds").cast("bigint"))
    )


_INTERP_SQL = """
WITH d AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(28,8))), 4) AS DOUBLE)
           / COUNT(value) AS v
  FROM events GROUP BY 1
), kept AS (
  SELECT day, v FROM d
  WHERE CAST(('0x' || substring(md5(CAST(day AS VARCHAR)), 1, 8)) AS BIGINT) % 5 <> 0
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d),
           INTERVAL 1 DAY)) AS DATE) AS day
), s AS (
  SELECT sp.day, k.v,
         LAST_VALUE(CASE WHEN k.v IS NOT NULL THEN k.v END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
         LAST_VALUE(CASE WHEN k.v IS NOT NULL THEN sp.day END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dp,
         FIRST_VALUE(CASE WHEN k.v IS NOT NULL THEN k.v END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
         FIRST_VALUE(CASE WHEN k.v IS NOT NULL THEN sp.day END IGNORE NULLS)
           OVER (ORDER BY sp.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
  FROM spine sp LEFT JOIN kept k USING (day)
)
SELECT day,
       v IS NULL AS is_gap,
       CASE WHEN v IS NOT NULL THEN v
            WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
              vp + (vn - vp) * (CAST(day - dp AS DOUBLE) / CAST(dn - dp AS DOUBLE))
            ELSE NULL END AS value_filled
FROM s
WHERE v IS NOT NULL OR (vp IS NOT NULL AND vn IS NOT NULL)
ORDER BY day
"""


@query("events_linear_interpolate_gaps", oracle=_INTERP_SQL)
def events_linear_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by LINEAR interpolation: the daily mean-value
    series loses ~20% of its days (an md5 gate simulates feed
    outages — deterministic, so the oracle sees the same gaps), a
    generated date spine restores the missing rows, and each gap is
    filled as vp + (vn−vp)·Δ — the straight line between its nearest
    real neighbors. Builds on `join_date_spine_gapfill` (which
    carries the LAST value forward); interpolation is the variant
    dashboards and feature pipelines actually want for slowly-varying
    metrics. Leading/trailing gaps (no neighbor on one side) are
    dropped, the standard convention.

    Engine-portability: the neighbor lookups are IGNORE NULLS edge
    windows (Spark: last/first(ignorenulls=True)); the fill chain is
    one subtraction, one integer-ratio division, one multiply-add on
    exact inputs — bit-identical IEEE in both engines, so the DOUBLE
    output needs no rounding.

    Scale: the aggregate is the only event-volume work; spine and
    windows run on the day frame, MONTH-PARTITIONED since r11 with a
    months-sized triangular struct-extreme carry for the cross-month
    neighbor lookup — no unpartitioned window at any day-span.
    """
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        (
            F.round(F.sum(F.col("value").cast("decimal(28,8)")), 4).cast("double")
            / F.count("value")
        ).alias("v")
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("day").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 5
    )
    kept = d.filter(gate != 0)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    from pyspark.sql import Window

    # r11: both IGNORE NULLS edge fills run MONTH-PARTITIONED and the
    # cross-month carry is a months-sized triangular struct-extreme
    # join — the last day-grain fill off the unpartitioned-window
    # allow-list. A (day, v) struct carries value and day together:
    # struct max/min orders by day first (days are unique), so the
    # latest non-null of the prior months / earliest of the later
    # months is one aggregate each.
    base = spine.join(kept, "day", "left").withColumn(
        "_m", F.date_trunc("month", F.col("day"))
    )
    nn = F.when(
        F.col("v").isNotNull(), F.struct(F.col("day").alias("d"), F.col("v").alias("x"))
    )
    w_prev = (
        Window.partitionBy("_m")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("_m")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    within = base.select(
        "day",
        "v",
        "_m",
        F.last(nn, ignorenulls=True).over(w_prev).alias("sp"),
        F.first(nn, ignorenulls=True).over(w_next).alias("sn"),
    )
    mext = base.groupBy("_m").agg(
        F.max(nn).alias("mlast"), F.min(nn).alias("mfirst")
    )
    a, b = mext.alias("a"), mext.alias("b")
    carry = (
        a.join(b, F.lit(True), "left")
        .groupBy(F.col("a._m").alias("_m"))
        .agg(
            F.max(F.when(F.col("b._m") < F.col("a._m"), F.col("b.mlast"))).alias(
                "cprev"
            ),
            F.min(F.when(F.col("b._m") > F.col("a._m"), F.col("b.mfirst"))).alias(
                "cnext"
            ),
        )
    )
    s = (
        within.join(F.broadcast(carry), "_m")
        .select(
            "day",
            "v",
            F.coalesce(F.col("sp.x"), F.col("cprev.x")).alias("vp"),
            F.coalesce(F.col("sp.d"), F.col("cprev.d")).alias("dp"),
            F.coalesce(F.col("sn.x"), F.col("cnext.x")).alias("vn"),
            F.coalesce(F.col("sn.d"), F.col("cnext.d")).alias("dn"),
        )
    )
    frac = F.datediff("day", "dp").cast("double") / F.datediff("dn", "dp").cast(
        "double"
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("vp").isNotNull() & F.col("vn").isNotNull(),
            F.col("vp") + (F.col("vn") - F.col("vp")) * frac,
        )
    )
    return (
        s.select(
            "day",
            F.col("v").isNull().alias("is_gap"),
            filled.alias("value_filled"),
        )
        .filter(F.col("value_filled").isNotNull())
        .orderBy("day")
    )


_NEAREST_SQL = """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view,
         FIRST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_view
  FROM events
), p AS (
  SELECT event_id, user_id,
         epoch_us(ts) AS t,
         epoch_us(prev_view) AS tp,
         epoch_us(next_view) AS tn
  FROM s WHERE event_type = 'purchase'
)
SELECT event_id, user_id,
       CAST(CASE WHEN tp IS NULL AND tn IS NULL THEN NULL
            WHEN tn IS NULL THEN (t - tp) // 1000000
            WHEN tp IS NULL THEN (tn - t) // 1000000
            WHEN (t - tp) <= (tn - t) THEN (t - tp) // 1000000
            ELSE (tn - t) // 1000000 END AS BIGINT) AS nearest_view_gap_s,
       CASE WHEN tp IS NULL AND tn IS NULL THEN NULL
            WHEN tn IS NULL THEN 'backward'
            WHEN tp IS NULL THEN 'forward'
            WHEN (t - tp) <= (tn - t) THEN 'backward'
            ELSE 'forward' END AS direction
FROM p
WHERE user_id < 30
ORDER BY event_id
"""


@query("events_asof_nearest", oracle=_NEAREST_SQL)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: for every purchase, the closest
    view by the same user in EITHER time direction (ties prefer
    backward — the causal side). The backward-only as-of join
    (`events_asof_join`) answers "state at time t"; the nearest
    variant answers "which exposure does this outcome belong to",
    the attribution question when events can be logged out of order.

    Spelled as ONE interleaved pass instead of two joins: both
    streams share a user_id sort, and two IGNORE NULLS edge windows
    (1 PRECEDING / 1 FOLLOWING frames, so a row never matches itself)
    pick each purchase's neighbors; the gap arithmetic is exact
    integer MICROSECONDS (the reported gap floors to seconds).
    The user_id < 30 predicate bounds the emitted
    rows; it pushes to the scan.

    Scale: one shuffle on user_id shared by both windows — compare
    two range joins (two shuffles + fan-out) for the same answer.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    w_next = base.rowsBetween(1, Window.unboundedFollowing)
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    s = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(view_ts, ignorenulls=True).over(w_prev).alias("prev_view"),
        F.first(view_ts, ignorenulls=True).over(w_next).alias("next_view"),
    ).filter(F.col("event_type") == "purchase")
    # microsecond-exact gaps (ADVICE r10 on the operator twin): tie
    # and direction resolve at full precision; only the REPORTED gap
    # floors to whole seconds (gaps are non-negative, so int-div ==
    # floor, matching DuckDB's `//` on epoch_us)
    t = F.unix_micros("ts")
    tp = F.unix_micros("prev_view")
    tn = F.unix_micros("next_view")
    back_gap, fwd_gap = t - tp, tn - t
    prefer_back = tp.isNotNull() & (tn.isNull() | (back_gap <= fwd_gap))
    us = F.lit(1_000_000)
    return (
        s.select(
            "event_id",
            "user_id",
            F.when(tp.isNull() & tn.isNull(), F.lit(None).cast("bigint"))
            .when(prefer_back, F.floor(back_gap / us))
            .otherwise(F.floor(fwd_gap / us))
            .cast("bigint")
            .alias("nearest_view_gap_s"),
            F.when(tp.isNull() & tn.isNull(), F.lit(None).cast("string"))
            .when(prefer_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
        .orderBy("event_id")
    )


_NEWRET_SQL = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(DATE_TRUNC('day', ts)) AS DATE) AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT CAST(DATE_TRUNC('day', e.ts) AS DATE) AS day, e.user_id,
         f.first_day
  FROM events e JOIN firsts f USING (user_id)
  GROUP BY 1, 2, 3
)
SELECT day,
       CAST(COUNT(*) FILTER (first_day = day) AS BIGINT) AS new_users,
       CAST(COUNT(*) FILTER (first_day < day) AS BIGINT) AS returning_users
FROM daily
GROUP BY day
ORDER BY day
"""


@query("events_new_vs_returning", oracle=_NEWRET_SQL)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user accounting — the growth chart every
    product dashboard leads with: a user is NEW on their first active
    day, RETURNING on every later active day. First-seen is computed
    once (per-user MIN), re-joined onto the per-(day, user) activity
    grain, and classified with a FILTER aggregate.

    Scale: both aggregates and the join key on user_id, so AQE rides
    one co-partitioned layout; the day rollup shuffles day-grain
    rows. At years × billions scale, first_day is the incremental
    dimension you persist (it only ever gains rows), making the daily
    job a join against a static table — the same pattern as
    dedup_cross_corpus_anti's reference set.
    """
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("first_day")
    )
    daily = (
        ev.select(F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id")
        .distinct()
        .join(firsts, "user_id")
    )
    return (
        daily.groupBy("day")
        .agg(
            F.count(F.when(F.col("first_day") == F.col("day"), 1))
            .cast("bigint")
            .alias("new_users"),
            F.count(F.when(F.col("first_day") < F.col("day"), 1))
            .cast("bigint")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


_BASKET_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey % 200 AS item
  FROM lineitem
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS together
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.item < b.item
  GROUP BY 1, 2
), singles AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS n_orders FROM items GROUP BY 1
), n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM items)
SELECT p.item_a, p.item_b, p.together,
       sa.n_orders AS n_a, sb.n_orders AS n_b,
       (SELECT n_baskets FROM n) AS n_baskets
FROM pairs p
JOIN singles sa ON sa.item = p.item_a
JOIN singles sb ON sb.item = p.item_b
WHERE p.together * (SELECT n_baskets FROM n) > 2 * sa.n_orders * sb.n_orders
ORDER BY p.together DESC, p.item_a, p.item_b
LIMIT 20
"""


@query("analytics_market_basket_pairs", oracle=_BASKET_SQL)
def analytics_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: items (part groups) that co-occur in
    the same order more than twice as often as independence predicts —
    lift = P(a,b)/(P(a)P(b)) > 2, spelled as the exact integer
    comparison together·N > 2·n_a·n_b (no probability quotients
    anywhere). Output: the 20 strongest pairs with their support
    counts; lift itself is recomputable from the emitted integers.

    Scale: the pair join is a SELF-join on the basket key — fan-out is
    Σ sizeᵢ², bounded by basket size (≤ 7 lines here), never |items|².
    That per-basket quadratic is the honest cost of pairwise basket
    mining; for big baskets you cap per-basket items first (top-k by
    frequency), the standard FP-growth preprocessing step. One
    shuffle on the basket key + two broadcastable single-item
    aggregates.
    """
    li = load(spark, sf_dir, "lineitem")
    items = li.select(
        "l_orderkey", (F.col("l_partkey") % 200).alias("item")
    ).distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("together"))
    )
    singles = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    n = items.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_baskets")
    )
    sa = singles.select(
        F.col("item").alias("item_a"), F.col("n_orders").alias("n_a")
    )
    sb = singles.select(
        F.col("item").alias("item_b"), F.col("n_orders").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("together") * F.col("n_baskets")
            > 2 * F.col("n_a") * F.col("n_b")
        )
        .select("item_a", "item_b", "together", "n_a", "n_b", "n_baskets")
        .orderBy(F.col("together").desc(), "item_a", "item_b")
        .limit(20)
    )


def _markov_stationary_oracle() -> str:
    """operators/graph.py:markov_stationary unrolled to SQL: the
    transition matrix is exact integer-count ratios (the attested
    events_transition_matrix bigram construction), and 16 fixed
    power-iteration rounds — flow = Σ π(s)·w(s,d) plus the
    absorbing-state mass hold — are emitted as MATERIALIZED CTEs
    (each round reads its predecessor twice; inlining would double
    the plan per round, the label-prop lesson). The operator's
    1e-12 early exit needs no mirroring: once it fires, further
    rounds move π by < 1e-12, far inside the 6-dp output rounding,
    so a full 16-round unroll lands on the same rounded values."""
    rounds = []
    for k in range(1, 17):
        prev = f"p{k - 1}"
        rounds.append(f"""p{k} AS MATERIALIZED (
  SELECT state, SUM(p) AS p FROM (
    SELECT t.d AS state, SUM(pp.p * t.w) AS p
    FROM {prev} pp JOIN trans t ON t.s = pp.state
    GROUP BY t.d
    UNION ALL
    SELECT pp.state, pp.p FROM {prev} pp
    LEFT JOIN states st ON st.s = pp.state WHERE st.s IS NULL
  ) u GROUP BY state
)""")
    chain = ",\n".join(rounds)
    return f"""
WITH seq AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), trans AS MATERIALIZED (
  SELECT event_type AS s, next_type AS d,
         COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS w
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), states AS MATERIALIZED (
  SELECT DISTINCT s FROM trans
), p0 AS MATERIALIZED (
  SELECT s AS state, 1.0 / (SELECT COUNT(*) FROM states) AS p FROM states
),
{chain},
visits AS (
  SELECT event_type AS state, COUNT(*) AS n_visits FROM events
  GROUP BY event_type
), tot AS (
  SELECT COUNT(*) * 1.0 AS tv FROM events
)
SELECT pi.state, ROUND(pi.p, 6) AS stationary_p,
       ROUND(v.n_visits / t.tv, 6) AS raw_share
FROM p16 pi JOIN visits v ON v.state = pi.state CROSS JOIN tot t
ORDER BY pi.state
"""


@query("events_markov_stationary", oracle=_markov_stationary_oracle)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run behavioral mix: the stationary distribution of the
    per-user event-type transition chain — where user sessions spend
    their time if the observed transition probabilities persist.
    Builds the row-stochastic matrix exactly like
    `events_transition_matrix` (lead() bigrams per user), then runs
    the power-iteration fixpoint (operators/graph.py:
    markov_stationary, 16 rounds).

    Hash-attested: the transition matrix is exact integer-count
    ratios and the 16 power-iteration rounds unroll to a DuckDB
    oracle (_markov_stationary_oracle — the label-prop precedent);
    conservation (Σπ = 1), fixpoint residual, and uniform-chain
    recovery stay property-tested in tests/test_graph.py. Output
    probabilities are rounded for a
    stable record; alongside each state's raw visit share for
    comparison — the stationary mix differs from raw frequency
    exactly when transition structure matters.

    Scale: the bigram aggregate is the corpus-sized work; the
    fixpoint runs on a state×state frame (25 rows here) — fixed cost
    regardless of event volume.
    """
    from pyspark.sql import Window

    from ibd_pipeline_spark.operators.graph import markov_stationary

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bigrams = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    counts = bigrams.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("src").agg(F.sum("n").alias("tot"))
    trans = counts.join(totals, "src").select(
        "src", "dst", (F.col("n") / F.col("tot")).alias("p")
    )
    pi = markov_stationary(trans)
    visits = ev.groupBy(F.col("event_type").alias("state")).agg(
        F.count(F.lit(1)).alias("n_visits")
    )
    tot = ev.agg(F.count(F.lit(1)).cast("double").alias("tot_visits"))
    return (
        pi.join(visits, "state")
        .crossJoin(F.broadcast(tot))
        .select(
            "state",
            F.round("p", 6).alias("stationary_p"),
            F.round(F.col("n_visits") / F.col("tot_visits"), 6).alias(
                "raw_share"
            ),
        )
        .orderBy("state")
    )


@query(
    "events_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
), tr AS (
  SELECT day, n_events,
         CASE WHEN COUNT(*) OVER w = 7
              THEN AVG(n_events) OVER w END AS trend,
         dayofweek(day) + 1 AS dow
  FROM daily
  WINDOW w AS (ORDER BY (day - DATE '1970-01-01')
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), seas AS (
  SELECT dow, AVG(n_events - trend) AS seasonal
  FROM tr WHERE trend IS NOT NULL GROUP BY dow
)
SELECT t.day, CAST(t.n_events AS BIGINT) AS n_events,
       ROUND(t.trend, 6) AS trend,
       ROUND(s.seasonal, 6) AS seasonal,
       ROUND(t.n_events - t.trend - s.seasonal, 6) AS residual
FROM tr t LEFT JOIN seas s ON s.dow = t.dow AND t.trend IS NOT NULL
ORDER BY t.day
""",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    volume: trend = centered 7-day moving average (full windows only
    — edge days get NULL, the textbook treatment), seasonal =
    day-of-week mean of the detrended series, residual = value −
    trend − seasonal. The monitoring primitive behind
    events_anomaly_rolling_zscore: an alert should fire on the
    RESIDUAL, not on raw volume, or every weekend looks like an
    incident.

    Exactness: the trend is an average of 7 BIGINT counts — exact in
    both engines (integer sum ÷ 7) — so the only cross-engine float
    drift is the day-of-week group mean's summation order (~1e-16),
    absorbed by the 6-dp output rounding. Spark dayofweek is
    Sunday=1; DuckDB's is Sunday=0 (+1 in the oracle).

    Scale: one shuffle to the day grain; the centered MA runs
    MONTH-PARTITIONED over a ±3-day-padded day frame
    (operators/calendar.py:with_month_padding — r11; previously an
    unpartitioned window, the documented escape now implemented) —
    RANGE-on-days frames are exactly correct under padding for any
    input. The seasonal means are a ≤7-row broadcast."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    from pyspark.sql import Window

    from ibd_pipeline_spark.operators.calendar import with_month_padding

    padded = with_month_padding(daily, "day", pad_before=3, pad_after=3)
    w = (
        Window.partitionBy("_m")
        .orderBy(F.unix_date("day"))
        .rangeBetween(-3, 3)
    )
    tr = padded.select(
        "day",
        "n_events",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("n_events").over(w)).alias(
            "trend"
        ),
        F.dayofweek("day").alias("dow"),
        "_own",
    ).filter("_own").drop("_own")
    seas = (
        tr.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(F.avg(F.col("n_events") - F.col("trend")).alias("seasonal"))
    )
    return (
        tr.join(
            F.broadcast(seas),
            (tr["dow"] == seas["dow"]) & tr["trend"].isNotNull(),
            "left",
        )
        .select(
            "day",
            "n_events",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(
                F.col("n_events") - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
        )
        .orderBy("day")
    )


@query(
    "events_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
), g AS (
  SELECT CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_daily,
         COUNT(*) AS nd
  FROM daily
), s AS (
  SELECT day,
         ROW_NUMBER() OVER (ORDER BY day) AS t,
         SUM(n_events) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily
), cand AS (
  SELECT day, t, cum,
         ABS(CAST(cum AS DOUBLE) - t * g.mean_daily) AS stat,
         g.mean_daily * g.nd AS total, g.nd AS nd
  FROM s, g WHERE t < g.nd
)
SELECT day AS changepoint_day,
       ROUND(stat, 4) AS cusum_stat,
       ROUND(CAST(cum AS DOUBLE) / t, 4) AS mean_before,
       ROUND((total - cum) / (nd - t), 4) AS mean_after
FROM cand ORDER BY stat DESC, day LIMIT 1
""",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift changepoint on daily event volume by the max-|CUSUM|
    statistic (binary segmentation, first split): for each candidate
    day t, stat_t = |cumsum_t − t·grand_mean| — the distance of the
    observed cumulative path from the no-change diagonal — and the
    changepoint is the day maximizing it (earliest day on ties),
    reported with the exact mean daily volume before/after the split.
    The companion to events_seasonal_decompose: decompose tells you
    the shape of normal, CUSUM tells you WHERE the level changed.

    Exactness: daily counts and cumulative sums are BIGINT; the only
    float ops (grand mean, t·mean, segment means) are identical IEEE
    double expressions in identical order on both engines, and the
    4-dp rounding applies only to the printed columns, not to the
    argmax comparison — both engines rank the same exact doubles.

    Scale: one shuffle to the day grain; the row-index/cumsum prefix
    quantities ride the month-partitioned stitch
    (operators/calendar.py:month_stitched_cumsum — r11; previously an
    unpartitioned day-frame window, the documented escape now
    implemented), so no single task ever holds the whole day spine;
    the grand-mean is a 1-row broadcast; the argmax is a LIMIT-1
    TakeOrdered, never a driver collect."""
    from ibd_pipeline_spark.operators.calendar import month_stitched_cumsum

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    g = daily.agg(
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("mean_daily"),
        F.count(F.lit(1)).alias("nd"),
    )
    # t = running count of days (== row_number: days are unique),
    # cum = running event total — both exact integer prefix sums.
    s = month_stitched_cumsum(
        daily.withColumn("one", F.lit(1).cast("bigint")),
        "day",
        ["one", "n_events"],
    ).select(
        "day",
        F.col("cum_one").alias("t"),
        F.col("cum_n_events").alias("cum"),
    )
    cand = s.crossJoin(F.broadcast(g)).filter(F.col("t") < F.col("nd"))
    stat = F.abs(F.col("cum").cast("double") - F.col("t") * F.col("mean_daily"))
    total = F.col("mean_daily") * F.col("nd")
    return (
        cand.select(
            "day",
            "t",
            "cum",
            stat.alias("stat"),
            total.alias("total"),
            "nd",
        )
        .orderBy(F.desc("stat"), "day")
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.round("stat", 4).alias("cusum_stat"),
            F.round(F.col("cum").cast("double") / F.col("t"), 4).alias("mean_before"),
            F.round(
                (F.col("total") - F.col("cum")) / (F.col("nd") - F.col("t")), 4
            ).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman revenue concentration per market segment
# ---------------------------------------------------------------------------

_HHI_SQL = """
WITH cr AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,8))), 2)
              AS DOUBLE) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), seg AS (
  SELECT segment, CAST(ROUND(SUM(CAST(rev AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS total_rev,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM cr GROUP BY segment
), sh AS (
  SELECT cr.segment,
         CAST(10000.0 * (cr.rev / seg.total_rev) * (cr.rev / seg.total_rev)
              AS DECIMAL(28,10)) AS s2
  FROM cr JOIN seg USING (segment)
)
SELECT seg.segment, seg.n_customers,
       ROUND(seg.total_rev, 2) AS total_rev,
       CAST(ROUND(SUM(sh.s2), 4) AS DOUBLE) AS hhi
FROM sh JOIN seg USING (segment)
GROUP BY seg.segment, seg.n_customers, seg.total_rev
ORDER BY seg.segment
"""


@query("analytics_hhi_concentration", oracle=_HHI_SQL)
def analytics_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue concentration per market segment:
    HHI = 10000·Σᵢ sᵢ² over customer revenue shares — the antitrust
    yardstick repurposed as "is this segment's revenue one whale or
    a long tail" (10000 = monopoly; <1500 ≈ unconcentrated). The
    concentration complement of quality_activity_gini: Gini reads
    inequality of the distribution, HHI reads dominance mass.

    Exactness: per-customer and per-segment revenue use exact
    decimal sums rounded in the decimal domain; each squared share
    is one identical double chain cast to decimal per customer so
    the segment fold is order-independent.

    Scale: one (segment, customer) aggregate (the corpus-sized
    shuffle), a segment-sized broadcast back, and a segment-keyed
    fold; no windows, no data-sized state."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("rev")
        )
    )
    seg = cr.groupBy("segment").agg(
        F.round(F.sum(F.col("rev").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("total_rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
    )
    sh = cr.join(F.broadcast(seg), "segment").select(
        "segment",
        "n_customers",
        "total_rev",
        (
            10000.0
            * (F.col("rev") / F.col("total_rev"))
            * (F.col("rev") / F.col("total_rev"))
        )
        .cast("decimal(28,10)")
        .alias("s2"),
    )
    return (
        sh.groupBy("segment", "n_customers", "total_rev")
        .agg(F.round(F.sum("s2"), 4).cast("double").alias("hhi"))
        .select(
            "segment",
            "n_customers",
            F.round("total_rev", 2).alias("total_rev"),
            "hhi",
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front) of customers by (revenue, order count)
# ---------------------------------------------------------------------------

_SKY_SQL = """
WITH cust AS (
  SELECT o_custkey AS custkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
), v AS (
  SELECT rev, CAST(MAX(n_orders) AS BIGINT) AS vmax FROM cust GROUP BY rev
), r AS (
  SELECT rev, vmax,
         MAX(vmax) OVER (ORDER BY rev DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS r_excl
  FROM v
), sky AS (
  SELECT c.custkey, c.rev, c.n_orders
  FROM cust c JOIN r ON r.rev = c.rev
  WHERE (r.r_excl IS NULL OR r.r_excl < c.n_orders)
    AND r.vmax <= c.n_orders
)
SELECT custkey, ROUND(rev, 2) AS revenue, n_orders
FROM sky ORDER BY rev DESC, custkey
"""


@query("analytics_skyline_pareto", oracle=_SKY_SQL)
def analytics_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front) of customers under (total revenue,
    order count): a customer survives iff NO other customer weakly
    dominates them on both axes with at least one strict — the
    classic "best under any monotone preference" database operator
    (Börzsönyi et al. 2001), here the whale shortlist no single
    score can produce.

    Distributed form: dominance collapses to ONE prefix-max scan —
    sort distinct revenue values descending; a point is dominated
    iff the running max of order-counts over STRICTLY higher
    revenues reaches its count, or a same-revenue point has strictly
    more orders. The exclusive prefix max rides the month-stitch
    running-extreme helper over a rank spine (rank from the
    distributed prefix sum — no unpartitioned window anywhere).

    Exactness: revenue is the exact decimal sum rounded at 2 (ties
    compare exactly); everything else is integer counting.

    Scale: one customer-key aggregate, a distinct-revenue spine
    (≪ customers), one range exchange for ranks, and a broadcast
    join back — never a pairwise dominance join (O(n²) is the naive
    skyline's named failure mode)."""
    from ibd_pipeline_spark.operators.calendar import (
        month_stitched_running_extreme,
    )
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    o = load(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    v = cust.groupBy("rev").agg(
        F.max("n_orders").cast("bigint").alias("vmax")
    ).withColumn("one", F.lit(1).cast("bigint"))
    ranked = with_global_prefix_sums(
        v, [(-F.col("rev")).alias("negrev")], ["one"]
    ).select("rev", "vmax", F.col("_cum_one").alias("rk"))
    # inclusive running max over the rank order, block-stitched
    rincl = month_stitched_running_extreme(
        ranked,
        "rk",
        "vmax",
        "r_incl",
        kind="max",
        block=F.floor(F.col("rk") / 64),
    )
    # exclusive prefix max = inclusive max at rank-1 (NULL at rank 1)
    prev = rincl.select(
        (F.col("rk") + 1).alias("rk_next"), F.col("r_incl").alias("r_excl")
    )
    spine = rincl.join(
        F.broadcast(prev), F.col("rk") == F.col("rk_next"), "left"
    ).select("rev", "vmax", "r_excl")
    sky = (
        cust.join(F.broadcast(spine), "rev")
        .filter(
            (F.col("r_excl").isNull() | (F.col("r_excl") < F.col("n_orders")))
            & (F.col("vmax") <= F.col("n_orders"))
        )
    )
    return sky.select(
        "custkey", F.round("rev", 2).alias("revenue"), "n_orders"
    ).orderBy(F.col("rev").desc(), "custkey")


# ---------------------------------------------------------------------------
# Association rules over user event-type baskets (support/confidence/lift)
# ---------------------------------------------------------------------------

_ASSOC_SQL = """
WITH basket AS (
  SELECT DISTINCT user_id, event_type FROM events
), nu AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM basket
), singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM basket
  GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.n_both,
       sa.n AS n_antecedent, sc.n AS n_consequent,
       ROUND(CAST(p.n_both AS DOUBLE) / nu.n_users, 6) AS support,
       ROUND(CAST(p.n_both AS DOUBLE) / sa.n, 6) AS confidence,
       ROUND((CAST(p.n_both AS DOUBLE) / sa.n)
             / (CAST(sc.n AS DOUBLE) / nu.n_users), 6) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.antecedent
JOIN singles sc ON sc.event_type = p.consequent
CROSS JOIN nu
ORDER BY antecedent, consequent
"""


@query("analytics_association_rules", oracle=_ASSOC_SQL)
def analytics_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-user event-type baskets: for every
    ordered pair (A → B), support P(A∧B), confidence P(B|A), and
    lift P(B|A)/P(B) — single-level Apriori, the market-basket
    primitive behind "users who error also churn" readouts; lift ≈ 1
    on independent behaviors, the off-1 pairs are the story.

    Exactness: all counts are exact integers off one DISTINCT
    (user, type) reduce; the three metrics are identical
    double-division chains rounded at 6.

    Scale: the basket self-join fans out per user by (basket size)²
    with baskets bounded by the CATALOG of event types (≤ k² = 25
    pairs per user, never user-quadratic); singles and the user
    count broadcast back onto the k·(k−1)-row pair frame."""
    ev = load(spark, sf_dir, "events")
    basket = ev.select("user_id", "event_type").distinct()
    nu = basket.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    singles = basket.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = basket.select(
        "user_id", F.col("event_type").alias("antecedent")
    )
    b = basket.select(
        F.col("user_id").alias("uid2"), F.col("event_type").alias("consequent")
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("uid2"))
            & (F.col("antecedent") != F.col("consequent")),
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("antecedent"), F.col("n").alias("n_antecedent")
    )
    sc = singles.select(
        F.col("event_type").alias("consequent"), F.col("n").alias("n_consequent")
    )
    out = (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(nu))
    )
    conf = F.col("n_both").cast("double") / F.col("n_antecedent")
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_antecedent",
        "n_consequent",
        F.round(F.col("n_both").cast("double") / F.col("n_users"), 6).alias(
            "support"
        ),
        F.round(conf, 6).alias("confidence"),
        F.round(
            conf / (F.col("n_consequent").cast("double") / F.col("n_users")),
            6,
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")


# ---------------------------------------------------------------------------
# ABC (Pareto) customer classification by revenue contribution
# ---------------------------------------------------------------------------

_ABC_SQL = """
WITH cr AS (
  SELECT o_custkey,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS rev
  FROM orders GROUP BY o_custkey
), tot AS (
  SELECT CAST(ROUND(SUM(CAST(rev AS DECIMAL(28,8))), 2) AS DOUBLE) AS trev,
         CAST(COUNT(*) AS BIGINT) AS ncust
  FROM cr
), ranked AS (
  SELECT rev,
         SUM(CAST(rev AS DECIMAL(28,8)))
           OVER (ORDER BY rev DESC, o_custkey) AS cumrev_d,
         ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rk
  FROM cr
), cls AS (
  SELECT CASE
           WHEN CAST(cumrev_d AS DOUBLE) / tot.trev <= 0.8 THEN 'A'
           WHEN CAST(cumrev_d AS DOUBLE) / tot.trev <= 0.95 THEN 'B'
           ELSE 'C' END AS abc_class,
         rev, rk, tot.ncust
  FROM ranked CROSS JOIN tot
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(ncust), 6) AS customer_share,
       CAST(ROUND(SUM(CAST(rev AS DECIMAL(28,8))), 2) AS DOUBLE)
         AS class_revenue
FROM cls GROUP BY abc_class ORDER BY abc_class
"""


@query("analytics_abc_classification", oracle=_ABC_SQL)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of customers by cumulative revenue
    contribution: rank by revenue descending, class A = the head
    carrying the first 80% of revenue, B = the next 15%, C = the
    tail — inventory management's 80/20 workhorse applied to
    accounts; together with HHI (dominance) and Gini (inequality)
    this completes the concentration-analytics kit with the
    actionable SEGMENTATION the other two only summarize.

    Exactness: per-customer and class revenues are exact decimal
    sums; the cumulative revenue is an exact DECIMAL running total
    over the (rev DESC, custkey) total order off the distributed
    prefix-sum spine (no unpartitioned window, no scale shed — the
    r11 calendar lesson); class boundaries compare the decimal
    cumsum's double image against 0.8/0.95 of the decimal total.

    Scale: one customer-key aggregate + one range exchange for the
    prefix sum; the class rollup is a 3-key aggregate."""
    from ibd_pipeline_spark.operators.ranking import with_global_prefix_sums

    o = load(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("rev")
    )
    cr = cr.withColumn("revd", F.col("rev").cast("decimal(28,8)"))
    ranked = with_global_prefix_sums(
        cr,
        [(-F.col("rev")).alias("negrev"), F.col("o_custkey")],
        ["revd"],
    )
    tot = ranked.agg(
        F.round(F.max("_tot_revd"), 2).cast("double").alias("trev"),
        F.count(F.lit(1)).cast("bigint").alias("ncust"),
    )
    share = F.col("_cum_revd").cast("double") / F.col("trev")
    cls = ranked.crossJoin(F.broadcast(tot)).select(
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
        "ncust",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("ncust"), 6
            ).alias("customer_share"),
            F.round(F.sum(F.col("rev").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# Theil index inequality decomposition (r13)
# ---------------------------------------------------------------------------

_THEIL_SQL = """
WITH cust AS (
  SELECT c.c_custkey AS ck, n.n_name AS nation,
         CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(28,8))), 2)
              AS DOUBLE) AS x
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY c.c_custkey, n.n_name
), grp AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))), 2) AS DOUBLE) AS xg
  FROM cust GROUP BY nation
), tot AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(ROUND(SUM(CAST(xg AS DECIMAL(28,8))), 2) AS DOUBLE) AS xt
  FROM grp
), within AS (
  SELECT c.nation,
         CAST(ROUND(SUM(CAST((c.x / g.xg) * ln(c.x * g.ng / g.xg)
                             AS DECIMAL(28,12))), 8) AS DOUBLE) AS tg
  FROM cust c JOIN grp g ON g.nation = c.nation
  GROUP BY c.nation
), folded AS (
  SELECT CAST(ROUND(SUM(CAST((g.xg / t.xt) * w.tg
                             AS DECIMAL(28,12))), 8) AS DOUBLE)
           AS t_within,
         CAST(ROUND(SUM(CAST((g.xg / t.xt)
                             * ln((g.xg / t.xt) / (CAST(g.ng AS DOUBLE) / t.n))
                             AS DECIMAL(28,12))), 8) AS DOUBLE)
           AS t_between,
         CAST(MAX(t.n) AS BIGINT) AS n_customers,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM grp g JOIN within w ON w.nation = g.nation CROSS JOIN tot t
)
SELECT n_customers, n_groups,
       ROUND(t_between, 6) AS theil_between,
       ROUND(t_within, 6) AS theil_within,
       ROUND(t_between + t_within, 6) AS theil_total
FROM folded
"""


@query("analytics_theil_index", oracle=_THEIL_SQL)
def analytics_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index over customer revenue, DECOMPOSED into
    between-nation and within-nation components — the additive
    decomposition is what Gini cannot do and why Theil is the
    concentration tool for "is revenue inequality driven by geography
    or by whales inside each market?". T_between =
    Σ_g s_g·ln(s_g/p_g) (s_g revenue share, p_g population share);
    T_within = Σ_g s_g·T_g with T_g = Σ_i (x_i/X_g)·ln(x_i·N_g/X_g);
    T_total = T_between + T_within exactly (emitted as the sum, so the
    identity is pinned by construction).

    Float discipline: revenues are exact-decimal sums cast to double
    (bit-identical inputs both engines), every ln/÷ term is the
    identical double chain, and each TERM is decimal-quantized before
    summation (the stats_combined_pvalues pattern) so the folds are
    order-independent.

    Scale: per-customer revenue is one map-side-combined aggregate;
    nation joins broadcast (25-row dim); the within fold shuffles the
    customer frame once on nation. No windows, no sorts."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("x")
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "x")
    )
    grp = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.round(F.sum(F.col("x").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("xg"),
    )
    tot = grp.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.round(F.sum(F.col("xg").cast("decimal(28,8)")), 2)
        .cast("double")
        .alias("xt"),
    )
    within = (
        cust.join(F.broadcast(grp), "nation")
        .select(
            "nation",
            (
                (F.col("x") / F.col("xg"))
                * F.log(F.col("x") * F.col("ng") / F.col("xg"))
            )
            .cast("decimal(28,12)")
            .alias("term"),
        )
        .groupBy("nation")
        .agg(F.round(F.sum("term"), 8).cast("double").alias("tg"))
    )
    folded = (
        grp.join(F.broadcast(within), "nation")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    ((F.col("xg") / F.col("xt")) * F.col("tg")).cast(
                        "decimal(28,12)"
                    )
                ),
                8,
            )
            .cast("double")
            .alias("t_within"),
            F.round(
                F.sum(
                    (
                        (F.col("xg") / F.col("xt"))
                        * F.log(
                            (F.col("xg") / F.col("xt"))
                            / (F.col("ng").cast("double") / F.col("n"))
                        )
                    ).cast("decimal(28,12)")
                ),
                8,
            )
            .cast("double")
            .alias("t_between"),
            F.max("n").cast("bigint").alias("n_customers"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        )
    )
    return folded.select(
        "n_customers",
        "n_groups",
        F.round(F.col("t_between"), 6).alias("theil_between"),
        F.round(F.col("t_within"), 6).alias("theil_within"),
        F.round(F.col("t_between") + F.col("t_within"), 6).alias(
            "theil_total"
        ),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indices between window halves (r13)
# ---------------------------------------------------------------------------

_PRICE_INDEX_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         CAST(date_diff('day', DATE '1995-01-01',
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS did
  FROM lineitem
), bnd AS (
  SELECT (MIN(did) + MAX(did)) // 2 AS mid FROM li
), h AS (
  SELECT l_partkey AS pk,
         CASE WHEN did < mid THEN 0 ELSE 1 END AS half,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,8))), 2) AS DOUBLE)
           AS q,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,8))), 2)
              AS DOUBLE) AS rev
  FROM li CROSS JOIN bnd
  GROUP BY 1, 2
), m AS (
  SELECT a.pk, a.q AS q0, a.rev / a.q AS p0,
         b.q AS q1, b.rev / b.q AS p1
  FROM h a JOIN h b ON a.pk = b.pk AND a.half = 0 AND b.half = 1
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(ROUND(SUM(CAST(p1 * q0 AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS l_num,
         CAST(ROUND(SUM(CAST(p0 * q0 AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS l_den,
         CAST(ROUND(SUM(CAST(p1 * q1 AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS p_num,
         CAST(ROUND(SUM(CAST(p0 * q1 AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS p_den
  FROM m
)
SELECT n_parts,
       ROUND(l_num / l_den, 6) AS laspeyres,
       ROUND(p_num / p_den, 6) AS paasche,
       ROUND(sqrt((l_num / l_den) * (p_num / p_den)), 6) AS fisher
FROM s
"""


@query("analytics_price_index_fisher", oracle=_PRICE_INDEX_SQL)
def analytics_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the two
    halves of the shipping window (unit-value prices per part):
    Laspeyres holds the base-period basket (Σp₁q₀/Σp₀q₀), Paasche the
    current one (Σp₁q₁/Σp₀q₁), Fisher is their geometric mean — the
    index-number classics behind every "did our average selling price
    actually move or did the mix shift?" question
    (analytics_mix_shift_decompose answers the additive version; this
    is the multiplicative one).

    Exactness: per-(part, half) quantity and revenue are exact
    decimals; unit values divide decimal-rounded doubles; every
    basket term p·q is decimal-quantized before folding; two
    divisions + one sqrt of bit-identical doubles at the end.

    Scale: one map-side-combined (part, half) aggregate, a part-keyed
    self-join (parts-dimension-sized, not lineitem-sized), one-row
    fold. The half split uses DAY-INDEX arithmetic (l_shipdate is
    day-grained and loads as TIMESTAMP_NTZ — datediff from a fixed
    epoch is the engine-safe midpoint, the variance-ratio idiom)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("did"),
    )
    mid = li.agg(
        F.expr("(MIN(did) + MAX(did)) DIV 2").alias("mid")
    )
    h = (
        li.crossJoin(F.broadcast(mid))
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.when(F.col("did") < F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
        )
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("q"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,8)")), 2)
            .cast("double")
            .alias("rev"),
        )
    )
    a = h.filter(F.col("half") == 0).select(
        "pk",
        F.col("q").alias("q0"),
        (F.col("rev") / F.col("q")).alias("p0"),
    )
    b = h.filter(F.col("half") == 1).select(
        "pk",
        F.col("q").alias("q1"),
        (F.col("rev") / F.col("q")).alias("p1"),
    )
    m = a.join(b, "pk")
    s = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(
            F.sum((F.col("p1") * F.col("q0")).cast("decimal(38,6)")), 2
        )
        .cast("double")
        .alias("l_num"),
        F.round(
            F.sum((F.col("p0") * F.col("q0")).cast("decimal(38,6)")), 2
        )
        .cast("double")
        .alias("l_den"),
        F.round(
            F.sum((F.col("p1") * F.col("q1")).cast("decimal(38,6)")), 2
        )
        .cast("double")
        .alias("p_num"),
        F.round(
            F.sum((F.col("p0") * F.col("q1")).cast("decimal(38,6)")), 2
        )
        .cast("double")
        .alias("p_den"),
    )
    lasp = F.col("l_num") / F.col("l_den")
    paas = F.col("p_num") / F.col("p_den")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# (moved from round10_analytics.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Exact Shapley attribution over journey channel sets
# ---------------------------------------------------------------------------

_SHAPLEY_SQL = """
WITH ord AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
  FROM ord GROUP BY user_id
), um AS (
  SELECT f.user_id,
         COALESCE(BIT_OR(CASE o.event_type
                           WHEN 'click' THEN 1 WHEN 'error' THEN 2
                           WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                         END), 0) AS mask
  FROM fp f LEFT JOIN ord o
    ON o.user_id = f.user_id AND o.rn < f.prn
  WHERE f.prn IS NOT NULL
  GROUP BY f.user_id
), mc AS (
  SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt FROM um GROUP BY mask
), sp AS (
  SELECT CAST(t.range AS INT) AS S FROM range(16) t
), v AS (
  SELECT sp.S,
         COALESCE(SUM(CASE WHEN (mc.mask | sp.S) = sp.S THEN mc.cnt END),
                  0) AS v
  FROM sp LEFT JOIN mc ON TRUE GROUP BY sp.S
), ch AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2),
                        ('signup', 4), ('view', 8)) c(channel, bit)
), marg AS (
  SELECT ch.channel,
         (CASE bit_count(sp.S) WHEN 0 THEN 6 WHEN 1 THEN 2
                               WHEN 2 THEN 2 ELSE 6 END)
           * (v1.v - v0.v) AS term
  FROM ch JOIN sp ON (sp.S & ch.bit) = 0
  JOIN v v0 ON v0.S = sp.S
  JOIN v v1 ON v1.S = (sp.S | ch.bit)
), phi AS (
  SELECT channel, CAST(SUM(term) AS BIGINT) AS shapley_x24
  FROM marg GROUP BY channel
), tot AS (SELECT SUM(shapley_x24) AS t FROM phi)
SELECT channel, shapley_x24,
       ROUND(CAST(shapley_x24 AS DOUBLE) / tot.t, 6) AS share
FROM phi, tot ORDER BY channel
"""


@query("analytics_shapley_attribution", oracle=_SHAPLEY_SQL)
def analytics_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over journey CHANNEL SETS —
    the game-theoretic multi-touch model next to the r9 Markov
    removal effects: channels are players, the characteristic
    v(S) = conversions whose pre-purchase touch set ⊆ S, and each
    channel's credit is its average marginal contribution over all
    orderings. With 4 channels the 2⁴ coalition values make the sum
    EXACT: φᵢ·4! = Σ_{S∌i} |S|!·(3−|S|)!·(v(S∪i) − v(S)) is pure
    integer algebra (weights 6/2/2/6), so `shapley_x24` is a BIGINT
    the driver hashes float-free; the share divides once at the end.
    v is monotone by construction (mask-subset counting), so every
    marginal ≥ 0 and shares sum to 1 over v(N) − v(∅).

    Scale: journey construction is the corpus-scale work (one
    user_id window + first-purchase truncation — the exact shape
    analytics_markov_attribution already pays); everything after
    runs on the 16-row mask-count frame. Exponential-in-channels is
    real but irrelevant at k=4 — past ~10 channels you sample
    permutations instead (and lose the exactness this query's
    oracle buys)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    # r16 (guide §2.4 — share the exchange): the old form paid a
    # groupBy(user_id) aggregate for the first-purchase row PLUS a
    # per-user inequality join (o.rn < f.prn) back onto the touches —
    # two more exchanges and a second evaluation of the row_number
    # window subtree. The pre-purchase touch mask is a CUMULATIVE
    # bit_or over the SAME (user_id, ts, event_id) window, read off at
    # the first-purchase row: bit_or skips NULL bits exactly as the
    # old left join + coalesce did, rows before the FIRST purchase
    # contain no purchase bits by definition, and users whose first
    # event is the purchase get the same mask 0. One shuffle total;
    # identical masks.
    ord_ = ev.select(
        "user_id", "event_type", F.row_number().over(w_u).alias("rn")
    ).select(
        "user_id",
        "event_type",
        "rn",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        )
        .over(Window.partitionBy("user_id"))
        .alias("prn"),
        F.coalesce(
            F.bit_or(bit).over(
                Window.partitionBy("user_id")
                .orderBy("rn")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_mask"),
    )
    um = ord_.filter(F.col("rn") == F.col("prn")).select(
        "user_id", F.col("cum_mask").alias("mask")
    )
    mc = um.groupBy("mask").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    sp = spark.range(16).select(F.col("id").cast("int").alias("S"))
    v = (
        sp.join(
            F.broadcast(mc),
            (F.col("mask").bitwiseOR(F.col("S")) == F.col("S")),
            "left",
        )
        .groupBy("S")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("v"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    w24 = (
        F.when(F.bit_count(F.col("S")) == 0, 6)
        .when(F.bit_count(F.col("S")) == 1, 2)
        .when(F.bit_count(F.col("S")) == 2, 2)
        .otherwise(6)
    )
    marg = (
        ch.crossJoin(F.broadcast(sp))
        .filter(F.col("S").bitwiseAND(F.col("bit")) == 0)
        .join(
            F.broadcast(v.select(F.col("S").alias("S0"), F.col("v").alias("v0"))),
            F.col("S") == F.col("S0"),
        )
        .join(
            F.broadcast(v.select(F.col("S").alias("S1"), F.col("v").alias("v1"))),
            F.col("S").bitwiseOR(F.col("bit")) == F.col("S1"),
        )
        .select("channel", (w24 * (F.col("v1") - F.col("v0"))).alias("term"))
    )
    phi = marg.groupBy("channel").agg(
        F.sum("term").cast("bigint").alias("shapley_x24")
    )
    tot = phi.agg(F.sum("shapley_x24").alias("t"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "shapley_x24",
            F.round(F.col("shapley_x24").cast("double") / F.col("t"), 6)
            .alias("share"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# (moved from round11b.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Weekly cohort retention triangle
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), first_d AS (
  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
), size_d AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first_d GROUP BY cohort_day
), ret AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM act a JOIN first_d f USING (user_id)
  GROUP BY 1, 2
)
SELECT r.cohort_day, r.day_offset, r.active_users, s.cohort_size,
       ROUND(CAST(r.active_users AS DOUBLE) / s.cohort_size, 6)
         AS retention_rate
FROM ret r JOIN size_d s USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


@query("analytics_cohort_retention", oracle=_COHORT_SQL)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — THE product-analytics table:
    users bucketed by first-activity day (the cohort), and for each
    later day the share of the cohort still active. Diagonal reads
    = aging; column reads = product-change impact. Day-grain here
    (the fixture spans 30 days); the week-grain variant is the same
    plan with date_trunc('week') at the act stage.

    Scale: one DISTINCT (user, week) shuffle (the only data-sized
    exchange), then a user-keyed min-reduce and a join back on
    user_id — both co-partitioned on the same key so AQE reuses the
    exchange; the final frame is (weeks × offsets), metadata-sized.
    retention_rate is bigint/bigint in double — exact inputs, same
    quotient bits on both engines.
    """
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    first_d = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    size_d = first_d.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    ret = (
        act.join(first_d, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(
            F.count_distinct(F.col("user_id"))
            .cast("bigint")
            .alias("active_users")
        )
    )
    return (
        ret.join(F.broadcast(size_d), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size"),
                6,
            ).alias("retention_rate"),
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# (moved from round8.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Mix-shift contribution decomposition (why did the metric move?)
# ---------------------------------------------------------------------------

_MIX_SHIFT_SQL = """
WITH o AS (
  SELECT c.c_mktsegment AS seg,
         year(o.o_orderdate) AS y,
         CAST(o.o_totalprice AS DOUBLE) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE year(o.o_orderdate) IN (1996, 1999)
), s AS (
  SELECT seg,
         CAST(COUNT(*) FILTER (y = 1996) AS BIGINT) AS n0,
         CAST(COUNT(*) FILTER (y = 1999) AS BIGINT) AS n1,
         SUM(v) FILTER (y = 1996) AS s0,
         SUM(v) FILTER (y = 1999) AS s1
  FROM o GROUP BY seg
), t AS (
  SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM s
)
SELECT seg,
       ROUND(CAST(s.n0 AS DOUBLE) / t.t0, 6) AS share_base,
       ROUND(CAST(s.n1 AS DOUBLE) / t.t1, 6) AS share_cmp,
       ROUND(s.s0 / s.n0, 4) AS rate_base,
       ROUND(s.s1 / s.n1, 4) AS rate_cmp,
       ROUND((CAST(s.n1 AS DOUBLE) / t.t1 - CAST(s.n0 AS DOUBLE) / t.t0)
             * (s.s0 / s.n0), 4) AS mix_effect,
       ROUND((CAST(s.n1 AS DOUBLE) / t.t1)
             * (s.s1 / s.n1 - s.s0 / s.n0), 4) AS rate_effect
FROM s, t
ORDER BY seg
"""


@query("analytics_mix_shift_decompose", oracle=_MIX_SHIFT_SQL)
def analytics_mix_shift_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift contribution decomposition — the 'why did average
    order value move' answer: between a base and comparison period
    (1996 vs 1999), the overall average decomposes EXACTLY as
    Δavg = Σ_seg [mix_effect + rate_effect] with
    mix_effect = Δshare·rate_base (the metric moved because segment
    weights shifted) and rate_effect = share_cmp·Δrate (it moved
    because segments themselves changed) — the identity
    Σ share₁r₁ − share₀r₀ = Σ (share₁−share₀)r₀ + share₁(r₁−r₀).
    events_period_over_period says THAT the metric moved; this says
    WHO moved it and through which lever.

    Exactness: per-segment counts and sums come from one conditional
    aggregate (FILTER), every ratio is the same IEEE double division
    in the same order on both engines, rounding only at the output.

    Scale: one orders scan with the year predicate pushed down, a
    broadcast customer-dimension join, a segment-grain conditional
    aggregate, and a 1-row total broadcast — no shuffle beyond the
    segment groupBy."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base, cmp_ = 1996, 1999
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").alias("y"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
        .filter(F.col("y").isin(base, cmp_))
    )
    s = j.groupBy("seg").agg(
        F.count(F.when(F.col("y") == base, 1)).cast("bigint").alias("n0"),
        F.count(F.when(F.col("y") == cmp_, 1)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("y") == base, F.col("v"))).alias("s0"),
        F.sum(F.when(F.col("y") == cmp_, F.col("v"))).alias("s1"),
    )
    t = s.agg(
        F.sum("n0").alias("t0"), F.sum("n1").alias("t1")
    )
    sh0 = F.col("n0").cast("double") / F.col("t0")
    sh1 = F.col("n1").cast("double") / F.col("t1")
    r0 = F.col("s0") / F.col("n0")
    r1 = F.col("s1") / F.col("n1")
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "seg",
            F.round(sh0, 6).alias("share_base"),
            F.round(sh1, 6).alias("share_cmp"),
            F.round(r0, 4).alias("rate_base"),
            F.round(r1, 4).alias("rate_cmp"),
            F.round((sh1 - sh0) * r0, 4).alias("mix_effect"),
            F.round(sh1 * (r1 - r0), 4).alias("rate_effect"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# (moved from round9.py in the r14 chronological->topic split;
# registry names, semantics, and oracles unchanged)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Markov removal-effect attribution (absorbing-chain channel credit)
# ---------------------------------------------------------------------------


def _markov_attribution_oracle() -> str:
    """operators/graph.py:absorption_probability unrolled to SQL over
    the variant-tagged chain (BASE + one variant per removed channel),
    16 value-iteration rounds as MATERIALIZED CTEs — the
    markov_stationary-oracle precedent. Transition weights are exact
    integer-count ratios; the per-round float sums match the Spark
    loop within double noise, far inside the 6-dp output rounding."""
    rounds = []
    for k in range(1, 17):
        prev = f"a{k - 1}"
        rounds.append(f"""a{k} AS MATERIALIZED (
  SELECT t.s AS state,
         SUM(t.w * CASE WHEN tg.state IS NOT NULL THEN 1.0
                        ELSE COALESCE(ap.a, 0.0) END) AS a
  FROM trans t
  LEFT JOIN targets tg ON tg.state = t.d
  LEFT JOIN {prev} ap ON ap.state = t.d
  GROUP BY t.s
)""")
    chain = ",\n".join(rounds)
    return f"""
WITH ord AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
  FROM ord GROUP BY user_id
), kept AS (
  SELECT o.user_id, o.event_type, o.rn
  FROM ord o JOIN fp f ON f.user_id = o.user_id
  WHERE f.prn IS NULL OR o.rn <= f.prn
), leads AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
  FROM kept
), steps AS (
  SELECT 'START' AS src, event_type AS dst FROM kept WHERE rn = 1
  UNION ALL
  SELECT src, COALESCE(nxt, 'END') AS dst FROM leads
  WHERE NOT (nxt IS NULL AND src = 'purchase')
), channels AS (
  SELECT DISTINCT event_type AS c FROM events WHERE event_type <> 'purchase'
), variants AS (
  SELECT 'BASE' AS v UNION ALL SELECT c FROM channels
), vcounts AS (
  SELECT vr.v, s.src,
         CASE WHEN s.dst = vr.v THEN 'END' ELSE s.dst END AS dst,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM steps s CROSS JOIN variants vr
  WHERE s.src <> vr.v
  GROUP BY 1, 2, 3
), trans AS MATERIALIZED (
  SELECT v || '|' || src AS s, v || '|' || dst AS d,
         n * 1.0 / SUM(n) OVER (PARTITION BY v, src) AS w
  FROM vcounts
), targets AS MATERIALIZED (
  SELECT v || '|purchase' AS state FROM variants
), a0 AS MATERIALIZED (
  SELECT DISTINCT s AS state, 0.0 AS a FROM trans
),
{chain},
base AS (
  SELECT a AS base_a FROM a16 WHERE state = 'BASE|START'
), re AS (
  SELECT string_split(state, '|')[1] AS channel,
         a AS a_removed,
         (SELECT base_a FROM base) AS base_a,
         CASE WHEN 1.0 - a / (SELECT base_a FROM base) > 0.0
              THEN 1.0 - a / (SELECT base_a FROM base) ELSE 0.0 END AS re
  FROM a16
  WHERE state LIKE '%|START' AND state <> 'BASE|START'
), tot AS (
  SELECT CAST(SUM(CAST(re AS DECIMAL(28,12))) AS DOUBLE) AS re_sum FROM re
)
SELECT channel,
       ROUND(base_a, 6) AS conv_base,
       ROUND(a_removed, 6) AS conv_removed,
       ROUND(re, 6) AS removal_effect,
       CASE WHEN t.re_sum > 0 THEN ROUND(re / t.re_sum, 6) END AS attribution
FROM re CROSS JOIN tot t
ORDER BY channel
"""


@query("analytics_markov_attribution", oracle=_markov_attribution_oracle)
def analytics_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: credit each channel
    (event_type) for conversions by how much the chain's
    START→purchase absorption probability DROPS when the channel is
    removed (transitions into it die to END) — the data-driven
    multi-touch model that replaces last-click heuristics.

    Per-user journeys truncate at the first purchase (absorbing);
    users who never purchase end at END (absorbing drop). One
    variant-tagged chain — BASE plus one variant per removed channel,
    states keyed 'variant|state' — feeds a SINGLE absorption fixpoint
    (operators/graph.py:absorption_probability, 16 value-iteration
    rounds) instead of k+1 separate loops. Removal effects clamp at 0
    (removing a dropout-feeder can raise conversion) and normalize to
    attribution shares.

    Hash-attested: transition weights are exact integer-count ratios;
    the fixpoint unrolls to a DuckDB CTE chain
    (_markov_attribution_oracle — the markov_stationary precedent).

    Scale: journey construction is the corpus-scale work (one user_id
    window + counts shuffle); the chain itself is
    (channels+2)·(variants)-sized — fixed cost regardless of event
    volume, like every fixpoint in operators/graph.py."""
    from pyspark.sql import Window

    from ibd_pipeline_spark.operators.graph import absorption_probability

    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # r16 (guide §2.4 — share the exchange): the first-purchase row
    # number is a second window over the SAME user_id partitioning
    # instead of the old groupBy(user_id) aggregate + join back, which
    # paid an extra exchange AND evaluated the row_number window
    # subtree twice (once under fp, once under kept). min-over-
    # partition of the identical when(purchase, rn) terms — values
    # unchanged, one shuffle total for the whole journey build.
    ord_ = ev.select(
        "user_id", "event_type", F.row_number().over(w_u).alias("rn")
    ).withColumn(
        "prn",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).over(Window.partitionBy("user_id")),
    )
    kept = ord_.filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    w_k = Window.partitionBy("user_id").orderBy("rn")
    leads = kept.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w_k).alias("nxt"),
    )
    starts = kept.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    steps = starts.unionByName(
        leads.filter(
            ~(F.col("nxt").isNull() & (F.col("src") == "purchase"))
        ).select("src", F.coalesce("nxt", F.lit("END")).alias("dst"))
    )
    # r16 (guide §5 — model state on the driver): the channel list is
    # event-type-domain-sized; collect it ONCE and feed both the
    # variant fan-out and the absorption targets from the same list —
    # the old distinct() frame re-scanned events a second time inside
    # absorption_probability's targets.collect().
    vlist = sorted(
        r["v"]
        for r in ev.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("v"))
        .distinct()
        .collect()
    ) + ["BASE"]
    variants = ev.sparkSession.createDataFrame(
        [(v,) for v in vlist], "v string"
    )
    vcounts = (
        steps.crossJoin(F.broadcast(variants))
        .filter(F.col("src") != F.col("v"))
        .groupBy(
            "v",
            "src",
            F.when(F.col("dst") == F.col("v"), F.lit("END"))
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vtot = vcounts.groupBy("v", "src").agg(F.sum("n").alias("tot"))
    trans = vcounts.join(vtot, ["v", "src"]).select(
        F.concat_ws("|", "v", "src").alias("src_s"),
        F.concat_ws("|", "v", "dst").alias("dst_s"),
        (F.col("n") / F.col("tot")).alias("p"),
    )
    targets = variants.select(
        F.concat_ws("|", "v", F.lit("purchase")).alias("state")
    )
    a = absorption_probability(
        trans, targets, src="src_s", dst="dst_s", prob="p", iters=16
    )
    starts_a = a.filter(F.col("state").endswith("|START")).select(
        F.substring_index("state", "|", 1).alias("variant"), "a"
    )
    base = starts_a.filter(F.col("variant") == "BASE").select(
        F.col("a").alias("base_a")
    )
    re = (
        starts_a.filter(F.col("variant") != "BASE")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("variant").alias("channel"),
            F.col("a").alias("a_removed"),
            "base_a",
            F.greatest(
                F.lit(0.0), F.lit(1.0) - F.col("a") / F.col("base_a")
            ).alias("re"),
        )
    )
    tot = re.agg(
        F.sum(F.col("re").cast("decimal(28,12)"))
        .cast("double")
        .alias("re_sum")
    )
    return (
        re.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round("base_a", 6).alias("conv_base"),
            F.round("a_removed", 6).alias("conv_removed"),
            F.round("re", 6).alias("removal_effect"),
            F.when(
                F.col("re_sum") > 0, F.round(F.col("re") / F.col("re_sum"), 6)
            ).alias("attribution"),
        )
        .orderBy("channel")
    )
