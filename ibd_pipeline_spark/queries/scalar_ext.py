"""Extended scalar-function coverage: higher-order array functions,
map type construction/access, regexp extraction, string padding/
slicing, datetime construction and formatting. All oracle-checked —
these round out the SURVEY §2.2 'scalar function library' row beyond
the first batch in relational.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query


@query(
    "array_higher_order_funcs",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       array_to_string(list_transform(list_slice(toks, 1, 5), x -> upper(x)), '-')
                                                              AS first5_upper,
       len(list_filter(toks, x -> length(x) > 5))             AS n_long_tokens,
       ROUND(list_reduce(list_transform(toks, x -> CAST(length(x) AS DOUBLE)),
                         (a, b) -> a + b), 1)                 AS total_chars,
       list_contains(toks, 'spark')                           AS mentions_spark,
       array_to_string(list_slice(toks, 1, 3), '-')           AS prefix_joined
FROM t
ORDER BY doc_id
""",
)
def array_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate / slice / array_join — the
    higher-order function suite over token arrays, fully in codegen
    (the same primitives that implement the vector math in
    operators.similarity)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)), "-"
        ).alias("first5_upper"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda a, b: a + b,
            ),
            1,
        ).alias("total_chars"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("prefix_joined"),
    ).orderBy("doc_id")


@query(
    "map_type_funcs",
    oracle="""
SELECT p_partkey,
       MAP(['brand', 'type'], [p_brand, p_type])['brand'][1] AS brand_from_map,
       list_contains(map_keys(MAP(['brand', 'type'], [p_brand, p_type])), 'type')
         AS has_type_key,
       len(map_keys(MAP(['brand', 'type'], [p_brand, p_type]))) AS n_keys
FROM part
WHERE p_partkey < 50
ORDER BY p_partkey
""",
)
def map_type_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + key access + introspection (the
    `tags map<string,string>` shape the InfluxDB sink models,
    SURVEY §1.1)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_from_map"),
        F.array_contains(F.map_keys(m), "type").alias("has_type_key"),
        F.size(F.map_keys(m)).alias("n_keys"),
    ).orderBy("p_partkey")


@query(
    "regexp_string_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, '#([0-9]+)', 1)     AS brand_num,
       lpad(CAST(p_size AS VARCHAR), 4, '0')       AS size_padded,
       reverse(p_name)                             AS name_rev,
       repeat(left(p_name, 2), 2)                  AS name_stutter,
       right(p_type, 3)                            AS type_suffix,
       CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INT)
                                                   AS consonant_len
FROM part
WHERE p_partkey < 60
ORDER BY p_partkey
""",
)
def regexp_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / padding / reverse / repeat / left-right
    slicing / global regexp_replace."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 60)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_name").alias("name_rev"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("name_stutter"),
        F.substring("p_type", -3, 3).alias("type_suffix"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("int").alias(
            "consonant_len"
        ),
    ).orderBy("p_partkey")


@query(
    "datetime_construction_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT)                     AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d')                      AS iso_day,
       last_day(CAST(o_orderdate AS DATE))                    AS month_end,
       CAST(date_part('quarter', o_orderdate) AS INT)         AS qtr,
       CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP)       AS due_ts,
       make_date(CAST(YEAR(o_orderdate) AS INT), 1, 1)        AS year_start
FROM orders
WHERE o_orderkey < 80
ORDER BY o_orderkey
""",
)
def datetime_construction_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch conversion, strftime-style formatting, last_day,
    quarter extraction, interval arithmetic, make_date."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 80)
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")).alias("due_ts"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).alias("year_start"),
    ).orderBy("o_orderkey")


@query(
    "null_handling_funcs",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS maybe_price,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS maybe_status
  FROM orders WHERE o_orderkey < 200
)
SELECT o_orderkey,
       ROUND(COALESCE(maybe_price, -1.0), 2)             AS price_or_default,
       CAST(maybe_price IS NULL AS BOOLEAN)              AS price_missing,
       COALESCE(maybe_status, 'UNKNOWN')                 AS status_filled,
       CASE WHEN maybe_price IS NULL AND maybe_status IS NULL THEN 'both'
            WHEN maybe_price IS NULL THEN 'price'
            WHEN maybe_status IS NULL THEN 'status'
            ELSE 'none' END                              AS null_profile,
       ROUND(IFNULL(maybe_price, 0.0) + 1.0, 2)          AS price_bumped,
       nullif(COALESCE(maybe_status, 'F'), 'F')          AS status_nullif_f
FROM t
ORDER BY o_orderkey
""",
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling suite: coalesce / isnull / ifnull / nullif /
    multi-way CASE — the null-guard vocabulary the reference's sink
    lacked (SURVEY §2 A3)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_totalprice"))
        .alias("maybe_price"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("maybe_status"),
    )
    return t.select(
        "o_orderkey",
        F.round(F.coalesce("maybe_price", F.lit(-1.0)), 2).alias("price_or_default"),
        F.isnull("maybe_price").alias("price_missing"),
        F.coalesce("maybe_status", F.lit("UNKNOWN")).alias("status_filled"),
        F.when(
            F.isnull("maybe_price") & F.isnull("maybe_status"), "both"
        )
        .when(F.isnull("maybe_price"), "price")
        .when(F.isnull("maybe_status"), "status")
        .otherwise("none")
        .alias("null_profile"),
        F.round(F.ifnull("maybe_price", F.lit(0.0)) + 1.0, 2).alias("price_bumped"),
        F.nullif(F.coalesce("maybe_status", F.lit("F")), F.lit("F")).alias(
            "status_nullif_f"
        ),
    ).orderBy("o_orderkey")


@query(
    "variant_json_stats",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the Spark 4 VARIANT type:
    parse_json once into a binary variant, variant_get typed paths —
    the modern replacement for per-path get_json_object string
    re-parsing (scalar_json_funcs shows the classic form). At scale
    VARIANT decodes the JSON a single time per row into a
    shredded-access binary; N path extractions don't re-tokenize N
    times. k is integral, so AVG is exact and partition-independent.

    The typed path value is PROJECTED before the groupBy: aggregate
    expressions don't share subexpressions, so referencing
    `variant_get(parse_json(props), ...)` inside both MAX and AVG
    buffers runs the whole JSON parse twice per row (measured 8.5×
    on the r06 driver bench). One projection materializes k once."""
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("k").cast("int").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )
