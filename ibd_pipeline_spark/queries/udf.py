"""UDF / UDAF / UDTF coverage (SURVEY §2.2): the three Python
extension points, each in its Arrow-batched form, with a DuckDB
oracle where the computation is deterministic arithmetic.

Rule of the house: a UDF must earn its place — everything here is
also expressible in SQL (that's what makes it oracle-checkable), and
the docstrings say when you'd actually drop to Python (external
libraries, per-group model scoring), per the 'UDFs are the slow
path' design note.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import query


@query(
    "pandas_udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(EXP((LN(l_quantity) + LN(l_extendedprice) + LN(1 + l_tax)) / 3), 6)
         AS geo_mean
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
""",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches, numpy vectorized): per-row
    geometric mean of three measures. In production you'd keep this
    exact computation in SQL (the oracle shows how); the UDF form is
    for when the per-row function needs a Python library."""
    from ibd_pipeline_spark.operators._arrow_udfs import geo_mean_udf as geo_mean

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(geo_mean("l_quantity", "l_extendedprice", "l_tax"), 6).alias("geo_mean"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "grouped_agg_pandas_udf",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_quantity * l_extendedprice) / SUM(l_quantity), 6)
         AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): quantity-weighted mean
    price per flag. The built-in formulation is two SUMs (the oracle);
    the UDAF form is the template for sketch-merge or model-fit
    aggregations that have no built-in."""
    from ibd_pipeline_spark.operators._arrow_udfs import weighted_avg_udf as wavg

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_quantity", "l_extendedprice"), 6).alias("weighted_avg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "python_udtf_ngrams",
    oracle="""
SELECT doc_id, pos, gram
FROM (
  SELECT doc_id,
         CAST(unnest(range(1, len(string_split(text,' ')))) AS INT) AS pos,
         string_split(text,' ')[CAST(unnest(range(1, len(string_split(text,' ')))) AS INT)]
           || ' ' ||
         string_split(text,' ')[CAST(unnest(range(1, len(string_split(text,' ')))) AS INT) + 1]
           AS gram
  FROM documents WHERE doc_id < 20
)
ORDER BY doc_id, pos
""",
)
def python_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input doc row → many
    (pos, bigram) rows. The lateral-join table-function extension
    point; here equivalent to explode over a gram array (the oracle),
    which is what you'd ship — the UDTF form is for generators that
    need Python state or libraries per emitted row."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, gram string")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i + 1, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigrams", Bigrams)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.gram
        FROM docs_for_udtf d, LATERAL bigrams(d.text) b
        ORDER BY d.doc_id, b.pos
        """
    )


@query(
    "window_time_range_frame",
    oracle="""
SELECT event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP)
                              RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW), 6)
         AS avg_6h
FROM events
ORDER BY event_id
""",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing 6-hour average — the
    value-based frame over event time that rowsBetween can't express
    (irregular event spacing). Spark SQL interval RANGE frames via
    the SQL path."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_tr")
    return spark.sql(
        """
        SELECT event_id,
               ROUND(AVG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts
                                      RANGE BETWEEN INTERVAL 6 HOURS PRECEDING AND CURRENT ROW), 6)
                 AS avg_6h
        FROM events_tr
        ORDER BY event_id
        """
    )


@query(
    "apply_in_pandas_zscore",
    oracle="""
SELECT user_id, event_id,
       ROUND((value - AVG(value) OVER (PARTITION BY user_id))
             / NULLIF(STDDEV_SAMP(value) OVER (PARTITION BY user_id), 0.0), 6)
         AS zscore
FROM events
ORDER BY user_id, event_id
""",
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map UDTF shape): per-user z-score
    normalization — each group arrives as one pandas frame, returns a
    frame. The oracle shows the analytic-window equivalent; the
    grouped-map form is the template for per-key model inference or
    resampling where a window function can't express the body.

    Scale: one shuffle on user_id; each group must fit in one
    executor's memory — bound group sizes (salt or pre-aggregate)
    before using this on power-law keys. No global orderBy on the
    output: a range-partitioned sort samples its child and would
    EXECUTE THE PYTHON STAGE TWICE (measured +75% wall); the
    correctness compare is order-insensitive, so the sort buys
    nothing."""
    li = load(spark, sf_dir, "events")
    return (
        li.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore_group_fn, "user_id long, event_id long, zscore double")
    )


def zscore_group_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score body for apply_in_pandas_zscore. Degenerate
    groups (single row, or zero variance) emit NULL — not NaN — to
    match the SQL NULLIF(stddev, 0) semantics of the oracle; Arrow
    converts pandas nullable Float64 NA to a Spark NULL, whereas a
    float64 NaN stays NaN and hash-diverges.

    numpy on the raw buffer, not pandas Series arithmetic: per-group
    Series overhead dominated the stage wall at 150 small groups
    (~2 s of the measured cost) for identical float64 results."""
    import numpy as np

    v = pdf["value"].to_numpy(dtype=np.float64)
    n = v.size
    sd = v.std(ddof=1) if n > 1 else float("nan")
    if sd == sd and sd != 0.0:
        z = pd.array(np.round((v - v.mean()) / sd, 6), dtype="Float64")
    else:
        z = pd.array([None] * n, dtype="Float64")
    return pd.DataFrame(
        {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z}
    )
