"""Table catalog over the driver-generated parquet fixtures.

``load(spark, sf_dir, name)`` returns the table as a DataFrame;
``register_all`` also creates temp views so queries can be written in
pure SQL. Scans stay declarative (``spark.read.parquet``) so Catalyst
gets predicate pushdown, column pruning, and partition pruning for
free — .explain() on any downstream query should show PushedFilters
and a ReadSchema restricted to the used columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are small at every scale factor and should be
# broadcast in joins (region: 5 rows, nation: 25 rows — fixed-size in
# TPC-H-style schemas regardless of SF).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Lazy-plan cache (r15, guide §1.2 driver overhead): spark.read.parquet
# re-reads the footer schema and re-lists the path on EVERY call —
# measured ~0.1 s of pure driver time per load(), ~600 calls across a
# full bench run. The cache holds the UNEXECUTED DataFrame (scan plan +
# schema — metadata, never rows): every action on it still scans the
# parquet files, so bench/oracle runs keep computing from the inputs;
# only the per-query footer/listing round-trip is deduplicated. Keyed
# by (applicationId, sf_dir, table) — a new JVM/app misses, same as the
# operator-state session caches.
_PLAN_CACHE: "dict[tuple, DataFrame]" = {}
_PLAN_CACHE_CAP = 64


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    # Cheap invalidation fingerprint (r16, ADVICE r15): rewriting the
    # fixture directory bumps its mtime, so a regenerated table misses
    # the cache instead of serving the stale file listing captured at
    # first load. One stat() per call — microseconds vs the ~0.1 s
    # footer/listing round-trip the cache exists to skip.
    try:
        stamp = os.path.getmtime(path)
    except OSError:
        stamp = -1.0
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
        stamp,
    )
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _PLAN_CACHE if k[0] != key[0]]:
        del _PLAN_CACHE[k]  # dead application's plans
    while len(_PLAN_CACHE) >= _PLAN_CACHE_CAP:
        del _PLAN_CACHE[next(iter(_PLAN_CACHE))]
    if name == "events":
        df = _load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    _PLAN_CACHE[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as two parquet physical types across
    driver testdata generations, both normalized here to a session-tz
    TIMESTAMP so every consumer (watermarks, unix_micros, window())
    sees one type:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
      (PARQUET_TYPE_ILLEGAL) — read as int64 nanos via the legacy
      conf and truncate to microseconds, the same ns→µs truncation
      DuckDB applies on CAST(ts AS TIMESTAMP). Integer DIV, not float
      division: ns values (~1.7e18) exceed double's 53-bit range.
    - timestamp[us] without the UTC flag: Spark infers TIMESTAMP_NTZ,
      which withWatermark and unix_micros reject — cast to TIMESTAMP.
      The session timezone is pinned to UTC (session.py), so the cast
      is value-preserving and agrees with DuckDB's naive reading."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register it as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def load_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load`, then widen the scan to the session's parallelism when
    the file layout would yield fewer splits than cores.

    Per-row-heavy operators (shingling, decode UDFs, vector math) over
    a table that is physically one small file otherwise execute as ONE
    task regardless of cluster size — at bench scale the documents
    table is a single 600 KB split, serializing seconds of expression
    work onto one core. At 100 TB the scan is thousands of splits and
    the estimator (operators.similarity._estimated_scan_splits — a
    zero-job file-size heuristic) leaves the plan untouched, so this
    is safe to use unconditionally on CPU-bound paths."""
    from ibd_pipeline_spark.operators.similarity import _estimated_scan_splits

    df = load(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if _estimated_scan_splits(df) < par:
        df = df.repartition(par)
    return df
