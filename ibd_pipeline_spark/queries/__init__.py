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
        multimodal,
        relational,
        relational2,
        scalar_ext,
        similarity,
        text,
        udf,
        weather,
        windows,
    )

    _LOADED = True
