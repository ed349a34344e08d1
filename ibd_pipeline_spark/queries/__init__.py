"""Query registry: the engine's public query inventory.

Each query is registered with a decorator; the driver contract
(``__spark_entry__.py``) exposes exactly this registry. Queries are
callables ``(spark, sf_dir) -> DataFrame``; most also carry an
equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables for differential correctness (SURVEY.md §5.1). Ops whose
semantics aren't SQL-expressible (e.g. MinHash LSH banding, ANN
search) register without an oracle and get a rows-only check.

Column-name contract: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before hashing values.

Float contract: double-valued aggregates are rounded (ROUND(x, k))
identically on both sides so that summation-order nondeterminism in
either engine can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def dsum(col, scale: int = 2):
    """Order-independent SUM for cross-engine value comparison: cast
    each double term to DECIMAL(28,8) (deterministic per-row), sum
    exactly (decimal addition commutes — no partial-aggregation-order
    noise), return double rounded to `scale`.

    Plain SUM(double) differs between engines (and between runs with
    different partitioning) in the last ulps; when the true value
    sits near a rounding boundary the rounded outputs diverge and the
    driver's value-hash flips. The SQL twin is
    ``CAST(ROUND(SUM(CAST(x AS DECIMAL(28,8))), scale) AS DOUBLE)`` —
    rounding happens in the exact decimal domain on both sides (HALF_UP
    away from zero) because decimal-structured data lands sums exactly
    on half-points, where double-rounding conventions diverge.
    """
    import pyspark.sql.functions as F

    return F.round(F.sum(col.cast("decimal(28,8)")), scale).cast("double")


def davg(col, scale: int = 4):
    """Partitioning-independent AVG for cross-engine comparison:
    exact decimal sum (order-independent) cast to double, divided by
    the non-null count — both engines then round the *same* double.
    Plain AVG(double) merges partial sums in partition order; on
    decimal-structured data whose true mean lands on a rounding
    half-point, the last-ulp noise decides the rounded digit. SQL
    twin: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) /
    COUNT(x), scale)``."""
    import pyspark.sql.functions as F

    return F.round(
        F.sum(col.cast("decimal(28,8)")).cast("double") / F.count(col), scale
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(28,8))), {scale}) AS DOUBLE)"


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid import cycles with the decorator.
    from ibd_pipeline_spark.queries import (  # noqa: F401
        analytics,
        dedup,
        events,
        maintenance,
        multimodal,
        relational,
        relational2,
        relational3,
        relational4,
        scalar_ext,
        similarity,
        text,
        training,
        udf,
        weather,
        windows,
    )

    _LOADED = True
