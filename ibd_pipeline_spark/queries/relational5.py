"""Fifth relational batch (round 5): SQL-surface widening — mode /
distribution window functions, pivot/unpivot reshaping, null-safe
joins, deterministic correlation/regression aggregates, and bitwise
aggregation. Each query states its shuffle budget; everything stays
in whole-stage codegen (no UDFs).

Reference parity note: the reference engine (spark_processor.py) has
no analog for any of these — they belong to the capability-gap
families of SURVEY.md §2.2 (agg variants, analytic windows, scalar
function library).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import dsum, dsum_sql, query


@query(
    "agg_mode_per_group",
    oracle="""
WITH c AS (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
         o_orderpriority,
         COUNT(*) AS n
  FROM orders
  GROUP BY 1, 2
), r AS (
  SELECT order_year, o_orderpriority AS mode_priority, n AS mode_count,
         ROW_NUMBER() OVER (PARTITION BY order_year
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM c
)
SELECT order_year, mode_priority, mode_count
FROM r WHERE rn = 1
ORDER BY order_year
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group, spelled deterministically: count
    sub-groups, then rank with an explicit value tiebreak. Built-in
    mode() is tie-nondeterministic in BOTH engines, so the portable
    (and testable) form is count + row_number — same cost: one hash
    aggregate (map-side combined) + one tiny per-year window.

    Scale: the aggregate shuffles (year, priority) pairs — cardinality
    ~ years × 5, independent of row count."""
    o = load(spark, sf_dir, "orders")
    counts = (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderpriority",
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("order_year").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "order_year",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("order_year")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = {
    "1-URGENT": "n_urgent",
    "2-HIGH": "n_high",
    "3-MEDIUM": "n_medium",
    "4-NOT SPECIFIED": "n_notspec",
    "5-LOW": "n_low",
}


@query(
    "agg_pivot_priority",
    oracle="""
SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
       CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS n_high,
       CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS n_medium,
       CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS n_notspec,
       CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS n_low
FROM orders
GROUP BY 1
ORDER BY order_year
""",
)
def agg_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshaping with an EXPLICIT pivot value list: order
    counts per year × priority. Passing the values up front matters at
    scale — without them, .pivot() runs an extra distinct-collect job
    over the full input to discover the columns before planning.

    The pivot compiles to exactly the oracle's conditional
    aggregation: ONE hash aggregate, no extra shuffle vs a plain
    groupBy."""
    o = load(spark, sf_dir, "orders")
    pv = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    sel = [F.col("order_year")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(_PRIO_ALIAS[p])
        for p in _PRIORITIES
    ]
    return pv.select(*sel).orderBy("order_year")


@query(
    "unpivot_part_measures",
    oracle="""
SELECT p_partkey, measure, val FROM (
  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val
  FROM part WHERE p_partkey <= 200
  UNION ALL
  SELECT p_partkey, 'retail', CAST(p_retailprice AS DOUBLE)
  FROM part WHERE p_partkey <= 200
) t
ORDER BY p_partkey, measure
""",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via unpivot (stack): one row per (part,
    measure). Spark's unpivot is a zero-shuffle per-row generator —
    the relational twin of explode — and the canonical input shape
    for generic per-measure profiling downstream.

    Scale: no shuffle at all until the final presentation sort."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return (
        p.select("p_partkey", "p_size", "p_retailprice")
        .unpivot(
            "p_partkey",
            [F.col("p_size").cast("double").alias("size"),
             F.col("p_retailprice").cast("double").alias("retail")],
            "measure",
            "val",
        )
        .withColumn(
            "measure",
            F.when(F.col("measure") == "size", "size").otherwise("retail"),
        )
        .orderBy("p_partkey", "measure")
    )


@query(
    "join_null_safe_eq",
    oracle="""
WITH lhs AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
  FROM customer WHERE c_custkey <= 500
), dim AS (
  SELECT NULLIF(s, 'BUILDING') AS seg, tier FROM (VALUES
    ('BUILDING', 'core'), ('AUTOMOBILE', 'growth'), ('MACHINERY', 'growth'),
    ('FURNITURE', 'niche'), ('HOUSEHOLD', 'niche')
  ) v(s, tier)
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM lhs JOIN dim ON lhs.seg IS NOT DISTINCT FROM dim.seg
GROUP BY tier
ORDER BY tier
""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics you
    want when NULL is a real category (unknown segment) rather than
    absent data. Still a hash-joinable equi-predicate: Catalyst plans
    a broadcast hash join on the null-safe key, NOT a nested loop.

    Scale: dim side is 5 rows → broadcast; fact side never shuffles."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        )
    )
    dim = spark.createDataFrame(
        [
            ("BUILDING", "core"),
            ("AUTOMOBILE", "growth"),
            ("MACHINERY", "growth"),
            ("FURNITURE", "niche"),
            ("HOUSEHOLD", "niche"),
        ],
        "s string, tier string",
    ).select(F.nullif(F.col("s"), F.lit("BUILDING")).alias("seg"), "tier")
    return (
        c.join(F.broadcast(dim), c["seg"].eqNullSafe(dim["seg"]))
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("tier")
    )


@query(
    "agg_corr_regression",
    oracle=f"""
WITH t AS (
  SELECT l_quantity AS x, l_extendedprice AS y
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
), s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql('x', 4)} AS sx,
         {dsum_sql('y', 4)} AS sy,
         {dsum_sql('x * x', 4)} AS sxx,
         {dsum_sql('y * y', 4)} AS syy,
         {dsum_sql('x * y', 4)} AS sxy
  FROM t
)
SELECT ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)         AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
         AS intercept
FROM s
""",
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + least-squares slope/intercept from the five
    classic moment sums. Built-in corr()/regr_slope() stream partial
    doubles in partition order (last-ulp nondeterminism across runs
    AND engines); here each moment is an exact decimal sum (order
    independent, the dsum contract), so the derived statistics are
    bit-stable. Same execution shape as the built-ins: ONE map-side-
    combined aggregate over the scan, five accumulators wide.

    Scale: single pass, one 1-row shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1997-01-01"
    )
    t = li.select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    s = t.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("x"), 4).alias("sx"),
        dsum(F.col("y"), 4).alias("sy"),
        dsum(F.col("x") * F.col("x"), 4).alias("sxx"),
        dsum(F.col("y") * F.col("y"), 4).alias("syy"),
        dsum(F.col("x") * F.col("y"), 4).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
    )


@query(
    "agg_bitwise_flags",
    oracle="""
SELECT event_type,
       CAST(bit_and(event_id % 256) AS BIGINT) AS flags_all,
       CAST(bit_or(event_id % 256)  AS BIGINT) AS flags_any,
       CAST(bit_xor(event_id % 256) AS BIGINT) AS flags_parity
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregation (bit_and / bit_or / bit_xor) over a derived
    8-bit flag word — the permission-mask / feature-flag rollup
    pattern. All three are commutative+associative, so they map-side
    combine like sum: one hash aggregate, shuffle = one row per
    event_type."""
    e = load(spark, sf_dir, "events")
    flags = (F.col("event_id") % 256).alias("f")
    return (
        e.select("event_type", flags)
        .groupBy("event_type")
        .agg(
            F.bit_and("f").alias("flags_all"),
            F.bit_or("f").alias("flags_any"),
            F.bit_xor("f").alias("flags_parity"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_string_reshape",
    oracle="""
SELECT c_custkey,
       translate(c_name, '#', '-')                    AS dashed,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0')      AS padded_key,
       split_part(c_name, '#', 1)                     AS name_prefix,
       reverse(c_mktsegment)                          AS seg_rev,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_dist
FROM customer
WHERE c_custkey <= 100
ORDER BY c_custkey
""",
)
def scalar_string_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-manipulation vocabulary round 5: translate / lpad /
    split_part / reverse / levenshtein-to-constant. All JVM codegen
    intrinsics — per-row, zero shuffle; the point of the oracle is
    cross-engine agreement on the edge semantics (multi-char
    translate, split_part on missing separator returns the whole
    string, levenshtein symmetry)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.translate("c_name", "#", "-").alias("dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
    ).orderBy("c_custkey")


@query(
    "scalar_datetime_arith",
    oracle="""
WITH t AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderkey <= 400
)
SELECT o_orderkey,
       CAST(last_day(d) AS DATE)                  AS month_end,
       CAST(date_trunc('week', d) AS DATE)        AS week_start,
       CAST(isodow(d) AS INT)                     AS iso_dow,
       CAST(weekofyear(d) AS INT)                 AS iso_week,
       CAST((1998 * 12 + 12)
            - (YEAR(d) * 12 + MONTH(d)) AS INT)   AS months_ago,
       CAST(d + INTERVAL 90 DAY AS DATE)          AS due_90d
FROM t
ORDER BY o_orderkey
""",
)
def scalar_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic vocabulary: last_day / week truncation /
    ISO day-of-week / ISO week number / whole-month deltas / day
    offsets. The cross-engine traps are deliberate test targets:
    Spark dayofweek() is Sunday=1 while DuckDB's is Sunday=0, so the
    portable spelling is ISO (weekday()+1 ≡ isodow); month deltas use
    the year*12+month lattice because months_between/datediff
    fraction-vs-boundary semantics differ between engines.

    months_ago is anchored to the fixture's TPC-H-style horizon
    (1998-12) rather than CURRENT_DATE: the engines may evaluate
    "today" under different timezones (Spark session TZ vs DuckDB
    system TZ), and a run straddling a month boundary would flip the
    value — a fixed anchor is deterministic forever. Per-row, zero
    shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    d = F.col("o_orderdate").cast("date")
    month_idx = F.lit(1998 * 12 + 12)
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        (month_idx - (F.year(d) * 12 + F.month(d))).cast("int").alias("months_ago"),
        F.date_add(d, 90).alias("due_90d"),
    ).orderBy("o_orderkey")


@query(
    "agg_string_concat_group",
    oracle="""
SELECT n_regionkey AS region_key,
       string_agg(n_name, '|' ORDER BY n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation
GROUP BY n_regionkey
ORDER BY region_key
""",
)
def agg_string_concat_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): one
    delimiter-joined, explicitly SORTED line per group. The sort
    inside the aggregate is what makes the result partition-invariant
    — collect_list alone returns arrival order, which changes with
    parallelism; array_sort before array_join pins it.

    Scale: one hash aggregate; the concatenated payload is the
    group's own data — bounded here (nations per region), cap or
    truncate when groups are open-ended."""
    n = load(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("region_key"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("region_key")
    )


@query(
    "agg_weighted_stats",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS total_weight,
       CAST(ROUND(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,8))), 2)
            AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE)
         AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean — Σ(w·x)/Σw per group, the aggregation SQL has no
    built-in for. Both sums ride exact decimals (order-invariant); the
    numerator is rounded in the decimal domain BEFORE the division
    (the davg rule: no rounding after a division, ever), so the
    quotient is bit-identical cross-engine.

    Scale: one map-side-combined hash aggregate carrying two decimal
    accumulators — same cost as an unweighted avg."""
    li = load(spark, sf_dir, "lineitem")
    wsum = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(28,8)")
    )
    tw = F.sum(F.col("l_quantity").cast("decimal(28,8)")).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            tw.alias("total_weight"),
            (F.round(wsum, 2).cast("double") / tw).alias("weighted_avg_price"),
        )
        .orderBy("l_returnflag")
    )
