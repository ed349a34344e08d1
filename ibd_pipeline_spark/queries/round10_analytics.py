"""Round-10 analytics / events / graph additions (split out of
round10.py in r11): file-overlap clustering depth, exact Shapley
attribution, Heaps-law vocabulary growth, tolerance-bounded
nearest-as-of join, Fano/burstiness arrival stats, and k-core
decomposition of the user co-activity graph."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# File-overlap clustering depth (layout health metric)
# ---------------------------------------------------------------------------

_OVERLAP_SQL = """
WITH f AS (
  SELECT o_orderkey % 64 AS file_id,
         MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi
  FROM orders GROUP BY 1
), ev AS (
  SELECT file_id, lo AS d, 1 AS delta FROM f
  UNION ALL
  SELECT file_id, hi AS d, -1 AS delta FROM f
), dep AS (
  SELECT file_id, delta,
         SUM(delta) OVER (ORDER BY d, delta DESC, file_id
                          ROWS UNBOUNDED PRECEDING) AS depth
  FROM ev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       ROUND(AVG(CAST(depth AS DOUBLE)), 4) AS avg_open_depth
FROM dep WHERE delta = 1
"""


@query("maintenance_file_overlap_depth", oracle=_OVERLAP_SQL)
def maintenance_file_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering depth of a file layout — the OPTIMIZE/Z-ORDER health
    metric: how many files' [min, max] key ranges overlap at once
    (depth 1 = perfectly clustered; high depth = every scan touches
    many files). Files simulated as orderkey%64 buckets with their
    orderdate ranges; depth is the classic +1/−1 boundary sweep —
    running sum over the 2·n_files boundary events, here as a
    TRIANGULAR SELF-JOIN on the file-count-sized boundary frame
    (n ≤ 128 rows → 16k join pairs) so no unpartitioned window
    appears anywhere in the plan. Boundary tie order (+1 before −1 at
    the same date: inclusive intervals overlap at a shared endpoint)
    is pinned by the (date, delta DESC, file_id) total order.

    Scale: the corpus-scale work is the per-file min/max aggregate
    (one map-side-combined pass); the sweep runs over file METADATA —
    at 100 TB that is the transaction log, not the data."""
    orders = load(spark, sf_dir, "orders")
    f = (
        orders.groupBy((F.col("o_orderkey") % 64).alias("file_id"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        # file-count-sized; pin it so the boundary union + triangular
        # join don't re-scan orders per reference
        .localCheckpoint(eager=True)
    )
    ev = f.select(
        "file_id", F.col("lo").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        f.select("file_id", F.col("hi").alias("d"), F.lit(-1).alias("delta"))
    )
    a, b = ev.alias("a"), F.broadcast(ev.alias("b"))
    # inclusive running sum under (d, delta DESC, file_id): b precedes
    # or equals a in the sweep order
    before = (
        (F.col("b.d") < F.col("a.d"))
        | ((F.col("b.d") == F.col("a.d")) & (F.col("b.delta") > F.col("a.delta")))
        | (
            (F.col("b.d") == F.col("a.d"))
            & (F.col("b.delta") == F.col("a.delta"))
            & (F.col("b.file_id") <= F.col("a.file_id"))
        )
    )
    dep = (
        a.join(b, before)
        .groupBy("a.file_id", "a.d", "a.delta")
        .agg(F.sum("b.delta").alias("depth"))
    )
    return (
        dep.filter(F.col("delta") == 1)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.max("depth").cast("bigint").alias("max_depth"),
            F.round(F.avg(F.col("depth").cast("double")), 4).alias(
                "avg_open_depth"
            ),
        )
    )


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
    ord_ = ev.select(
        "user_id", "event_type", F.row_number().over(w_u).alias("rn")
    )
    fp = ord_.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).alias("prn")
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    touches = ord_.select("user_id", bit.alias("bit"), "rn")
    um = (
        fp.filter(F.col("prn").isNotNull())
        .alias("f")
        .join(
            touches.alias("o"),
            (F.col("o.user_id") == F.col("f.user_id"))
            & (F.col("o.rn") < F.col("f.prn")),
            "left",
        )
        .groupBy("f.user_id")
        .agg(F.coalesce(F.bit_or("o.bit"), F.lit(0)).alias("mask"))
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
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------

_HEAPS_BUCKETS = 20

_HEAPS_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), docs AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_transform(range(1, len(w) - 1),
                     i -> array_to_string(list_slice(w, i, i + 2), ' '))
              ELSE [array_to_string(w, ' ')] END AS toks
  FROM raw
), nd AS (
  SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS doc_cnt
  FROM docs
), tok AS (
  SELECT d.doc_id, u.tok FROM docs d, unnest(d.toks) AS u(tok)
), firsts AS (
  SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok
), vb AS (
  SELECT CAST(FLOOR(fd * {_HEAPS_BUCKETS} / nd.n_docs) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM firsts, nd GROUP BY 1
), tb AS (
  SELECT CAST(FLOOR(doc_id * {_HEAPS_BUCKETS} / nd.n_docs) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM tok, nd GROUP BY 1
), pts AS (
  SELECT tb.b,
         SUM(tb.t) OVER (ORDER BY tb.b) AS n_cum,
         SUM(COALESCE(vb.v, 0)) OVER (ORDER BY tb.b) AS v_cum
  FROM tb LEFT JOIN vb ON vb.b = tb.b
), lp AS (
  SELECT CAST(ROUND(ln(CAST(n_cum AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
         CAST(ROUND(ln(CAST(v_cum AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y
  FROM pts
), mm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM lp
), fit AS (
  SELECT k,
         (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (k * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
         (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           * (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / ((k * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (k * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2,
         CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
  FROM mm
), tots AS (
  SELECT CAST(MAX(n_cum) AS BIGINT) AS n_tokens,
         CAST(MAX(v_cum) AS BIGINT) AS vocab
  FROM pts
)
SELECT nd.doc_cnt AS n_docs, tots.n_tokens, tots.vocab,
       ROUND(fit.b, 4) AS heaps_b,
       ROUND((fit.syd - fit.b * fit.sxd) / fit.k, 4) AS heaps_logk,
       ROUND(fit.r2, 4) AS r_squared
FROM nd, tots, fit
"""


@query("text_heaps_law", oracle=_HEAPS_SQL)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: V(N) ≈ k·N^b — the sublinear
    vocabulary scaling every tokenizer-budget and dedup-capacity
    plan leans on. Vocabulary unit = 3-GRAM SHINGLES (the corpus's
    word vocabulary is a closed 31-term set — flat V(N), r² undefined;
    shingle vocabulary genuinely grows). The curve is sampled at 20
    corpus prefixes WITHOUT any sequential scan: a shingle's
    FIRST-OCCURRENCE doc (one min aggregate) assigns it to the bucket
    where it enters the vocabulary, so cumulative (tokens, vocab) per
    bucket is a
    20-row prefix sum — computed here as conditional sums over the
    bucket frame, window-free. The log-log least-squares fit rounds
    ln-values to 9 decimals into DECIMALs BEFORE summing (a raw
    double sum over buckets would be partial-order-dependent
    cross-engine), then solves slope/intercept/R² in fixed double
    algebra.

    Scale: two corpus-scale aggregates (first-occurrence min per
    token — vocab-sized shuffle — and per-bucket token counts);
    everything else is 20-row algebra. doc_id density assumption:
    buckets are doc_id-ranged (FLOOR(id·B/max+1)); sparse ids skew
    bucket widths, not correctness."""
    # words PHYSICALLY materialized (localCheckpoint below): a merely
    # projected split(text) gets CollapseProject-inlined back into the
    # gram lambda and re-splits per gram — the Catalyst
    # nested-expression blowup (measured ~6 s -> ~1 s on 5000 docs)
    w = F.col("w")
    nw = F.size(w)
    gram3 = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j + 1) for j in range(3)]
    )
    shingles = F.when(
        nw >= 3, F.transform(F.sequence(F.lit(0), nw - 3), gram3)
    ).otherwise(F.array(F.concat_ws(" ", w)))
    docs = (
        load(spark, sf_dir, "documents")
        # single-split corpus: widen before the shingle explode or
        # the whole vocab build runs on one task
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint(eager=True)  # split exactly once (see above)
        .select("doc_id", shingles.alias("toks"))
        # two consumers below (vocab firsts + bucket token counts):
        # materialize the shingle arrays once
        .localCheckpoint(eager=True)
    )
    nd = docs.agg(
        (F.max("doc_id") + 1).cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("doc_cnt"),
    )
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    bkt = lambda c: F.floor(  # noqa: E731
        F.col(c) * _HEAPS_BUCKETS / F.col("n_docs")
    ).cast("bigint")
    firsts = tok.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    vb = (
        firsts.crossJoin(F.broadcast(nd))
        .groupBy(bkt("fd").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    tb = (
        tok.crossJoin(F.broadcast(nd))
        .groupBy(bkt("doc_id").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    # 20-row cumulative sums via triangular self-join (window-free)
    base = tb.join(vb, "b", "left").select(
        "b", "t", F.coalesce("v", F.lit(0)).alias("v")
    )
    l, r = base.alias("l"), base.alias("r")
    pts = (
        l.join(r, F.col("r.b") <= F.col("l.b"))
        .groupBy(F.col("l.b").alias("b"))
        .agg(
            F.sum("r.t").alias("n_cum"),
            F.sum("r.v").alias("v_cum"),
        )
    )
    dec = "decimal(28,9)"
    lp = pts.select(
        F.round(F.log(F.col("n_cum").cast("double")), 9).cast(dec).alias("x"),
        F.round(F.log(F.col("v_cum").cast("double")), 9).cast(dec).alias("y"),
    )
    mm = lp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    kd = F.col("k").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = kd * F.col("sxy").cast("double") - sxd * syd
    dxx = kd * F.col("sxx").cast("double") - sxd * sxd
    dyy = kd * F.col("syy").cast("double") - syd * syd
    b = num / dxx
    tots = pts.agg(
        F.max("n_cum").cast("bigint").alias("n_tokens"),
        F.max("v_cum").cast("bigint").alias("vocab"),
    )
    fit = mm.select(
        F.round(b, 4).alias("heaps_b"),
        F.round((syd - b * sxd) / kd, 4).alias("heaps_logk"),
        F.round(num * num / (dxx * dyy), 4).alias("r_squared"),
    )
    return (
        nd.select("doc_cnt")
        .crossJoin(F.broadcast(tots))
        .crossJoin(F.broadcast(fit))
        .select(
            F.col("doc_cnt").alias("n_docs"),
            "n_tokens",
            "vocab",
            "heaps_b",
            "heaps_logk",
            "r_squared",
        )
    )


# ---------------------------------------------------------------------------
# Nearest-as-of join (bidirectional, tolerance-bounded)
# ---------------------------------------------------------------------------

_ASOF_NEAREST_TOL = 7 * 24 * 3600  # 7 days

_ASOF_NEAREST_SQL = f"""
WITH p AS (
  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS order_ts,
         o_custkey % 50 AS k
  FROM orders WHERE o_orderkey < 100
), m AS (
  SELECT p.o_orderkey, p.order_ts, b.bwd, f.fwd,
         epoch_us(p.order_ts) - epoch_us(b.bwd) AS gb,
         epoch_us(f.fwd) - epoch_us(p.order_ts) AS gf
  FROM p
  LEFT JOIN LATERAL (
    SELECT MAX(CAST(ts AS TIMESTAMP)) AS bwd FROM events
    WHERE user_id = p.k AND CAST(ts AS TIMESTAMP) <= p.order_ts
  ) b ON TRUE
  LEFT JOIN LATERAL (
    SELECT MIN(CAST(ts AS TIMESTAMP)) AS fwd FROM events
    WHERE user_id = p.k AND CAST(ts AS TIMESTAMP) >= p.order_ts
  ) f ON TRUE
), g AS (
  SELECT o_orderkey, order_ts,
         CASE WHEN gb IS NOT NULL AND gb <= CAST({_ASOF_NEAREST_TOL} AS BIGINT) * 1000000
              THEN bwd END AS bwd,
         CASE WHEN gf IS NOT NULL AND gf <= CAST({_ASOF_NEAREST_TOL} AS BIGINT) * 1000000
              THEN fwd END AS fwd,
         gb, gf
  FROM m
)
SELECT o_orderkey, order_ts,
       CASE WHEN bwd IS NOT NULL AND (fwd IS NULL OR gb <= gf)
            THEN bwd ELSE fwd END AS nearest_ts,
       CAST(CASE WHEN bwd IS NOT NULL AND (fwd IS NULL OR gb <= gf)
                 THEN gb // 1000000
                 WHEN fwd IS NOT NULL THEN gf // 1000000
            END AS BIGINT) AS gap_seconds,
       CASE WHEN bwd IS NOT NULL AND (fwd IS NULL OR gb <= gf)
            THEN 'backward'
            WHEN fwd IS NOT NULL THEN 'forward' END AS direction
FROM g ORDER BY o_orderkey
"""


@query("join_asof_nearest_tolerance", oracle=_ASOF_NEAREST_SQL)
def join_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-as-of join with a 7-day tolerance — the bidirectional
    sibling of events_asof_join (backward-only): each order matches
    its closest event in EITHER direction on the same key, exact
    ties resolving backward, matches past the tolerance nulled (the
    pandas merge_asof `tolerance` contract) — the sensor/trade-quote
    alignment operator Spark lacks natively.

    Composition (operators/joins.py:asof_nearest_join): ONE
    union-and-sort shuffle on the key carries BOTH direction fills —
    a backward last() frame and a forward first() frame over the same
    sorted union — then the nearer side wins by MICROSECOND-exact
    gap comparison (unix_micros / epoch_us on the two engines); only
    the reported gap_seconds floors the true gap (ADVICE r10: the
    earlier per-side second-truncation mis-resolved sub-second
    ties). No range explosion, no second exchange."""
    from ibd_pipeline_spark.operators.joins import asof_nearest_join

    probes = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("order_ts"),
            (F.col("o_custkey") % 50).alias("k"),
        )
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("ts").alias("event_ts")
    )
    return (
        asof_nearest_join(
            probes,
            events,
            key="k",
            probe_time="order_ts",
            event_time="event_ts",
            tolerance_seconds=_ASOF_NEAREST_TOL,
        )
        .select(
            "o_orderkey",
            "order_ts",
            F.col("nearest_event_ts").alias("nearest_ts"),
            "gap_seconds",
            "direction",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Fano factor / burstiness of event arrivals
# ---------------------------------------------------------------------------

_FANO_SQL = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM h GROUP BY event_type
), d AS (
  SELECT event_type, n_hours, s,
         CAST(s AS DOUBLE) / n_hours AS mu,
         CASE WHEN n_hours > 1 THEN
           (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_hours)
             / (n_hours - 1) END AS vr
  FROM m
)
SELECT event_type, n_hours, s AS n_events,
       ROUND(mu, 6) AS mean_per_hour,
       ROUND(vr / mu, 6) AS fano_factor,
       ROUND(vr / (mu * mu), 6) AS cv_squared,
       ROUND((sqrt(vr) - mu) / (sqrt(vr) + mu), 6) AS burstiness
FROM d ORDER BY event_type
"""


@query("events_fano_burstiness", oracle=_FANO_SQL)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival burstiness per event type from hourly bucket counts —
    the monitoring trio nothing else in the registry covers: Fano
    factor (var/mean; 1 = Poisson, >1 = overdispersed/bursty), CV²
    (var/mean² — the squared coefficient of variation queueing theory
    keys on), and the Goh–Barabási burstiness B = (σ−μ)/(σ+μ)
    ∈ (−1, 1). Bucket counts are exact BIGINTs, so the (n, Σc, Σc²)
    moments are integers and every statistic is fixed double algebra
    at output.

    Scale: one map-side-combined (type, hour) count — the grain is
    calendar-bounded — then a type-level moment aggregate; no window,
    no join."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    mu = F.col("s").cast("double") / F.col("n_hours")
    # n_hours == 1 → no sample variance; emit NULL, never NaN
    # (ADVICE r10; streaming twin streaming/burstiness.py matches)
    vr = F.when(
        F.col("n_hours") > 1,
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n_hours")
        )
        / (F.col("n_hours") - 1),
    )
    sd = F.sqrt(vr)
    return m.select(
        "event_type",
        "n_hours",
        F.col("s").alias("n_events"),
        F.round(mu, 6).alias("mean_per_hour"),
        F.round(vr / mu, 6).alias("fano_factor"),
        F.round(vr / (mu * mu), 6).alias("cv_squared"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# k-core decomposition (bounded peel) of the user co-activity graph
# ---------------------------------------------------------------------------

_KCORE_K, _KCORE_ROUNDS = 3, 4


def _kcore_oracle() -> str:
    head = """
WITH b AS (
  SELECT DISTINCT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, user_id
  FROM events
), e0 AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM b a JOIN b c
    ON a.event_type = c.event_type AND a.h = c.h
   AND a.user_id < c.user_id
)"""
    body = ""
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        body += f""",
d{r} AS MATERIALIZED (
  SELECT n, CAST(SUM(c) AS BIGINT) AS deg FROM (
    SELECT u AS n, COUNT(*) AS c FROM {prev} GROUP BY u
    UNION ALL
    SELECT v AS n, COUNT(*) AS c FROM {prev} GROUP BY v
  ) GROUP BY n
), a{r} AS MATERIALIZED (
  SELECT n FROM d{r} WHERE deg >= {_KCORE_K}
), e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  JOIN a{r} x ON x.n = e.u JOIN a{r} y ON y.n = e.v
)"""
        prev = f"e{r}"
    tail = f"""
SELECT d.n AS user_id, d.deg AS core_degree
FROM (
  SELECT n, CAST(SUM(c) AS BIGINT) AS deg FROM (
    SELECT u AS n, COUNT(*) AS c FROM {prev} GROUP BY u
    UNION ALL
    SELECT v AS n, COUNT(*) AS c FROM {prev} GROUP BY v
  ) GROUP BY n
) d
WHERE d.deg >= {_KCORE_K}
ORDER BY user_id
"""
    return head + body + tail


@query("graph_kcore_peel", oracle=_kcore_oracle)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k = 3, bounded 4-round peel) of the user
    CO-ACTIVITY graph — nodes are users, an edge joins two users
    active in the same (event_type, hour) bucket; the k-core (every
    member keeps ≥ k neighbors INSIDE the core) is the dense-cohort
    extractor behind fraud-ring mining, community seeding, and
    engaged-user carving that degree thresholds alone miss (a
    high-degree node hanging off a sparse fringe is NOT core).
    Each peel round drops nodes whose degree fell below k and
    restricts edges to survivors; like every fixpoint in
    operators/graph.py the round count is FIXED (4 — the peel is
    monotone, so round r output is the exact r-round peel and an
    upper bound on the true core) and the oracle unrolls the same
    rounds as a CTE chain.

    Scale: edge construction is the bucket self-join — co-activity
    buckets are (type × hour)-bounded, so pair fan-out is per-bucket
    quadratic, never user-quadratic (the same blocking argument as
    every dedup family); each peel round is one degree aggregate +
    one semi-join, edge-set-sized."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        "user_id",
    ).distinct()
    a, c = b.alias("a"), b.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.event_type") == F.col("c.event_type"))
            & (F.col("a.h") == F.col("c.h"))
            & (F.col("a.user_id") < F.col("c.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("c.user_id").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("u").alias("n"))
            .unionAll(edges.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )

    for _ in range(_KCORE_ROUNDS):
        alive = degrees(e).filter(F.col("deg") >= _KCORE_K).select("n")
        e = (
            e.join(alive.withColumnRenamed("n", "u"), "u", "semi")
            .join(alive.withColumnRenamed("n", "v"), "v", "semi")
            .select("u", "v")
            .localCheckpoint(eager=True)  # next round reads it twice
        )
    return (
        degrees(e)
        .filter(F.col("deg") >= _KCORE_K)
        .select(F.col("n").alias("user_id"), F.col("deg").alias("core_degree"))
        .orderBy("user_id")
    )
