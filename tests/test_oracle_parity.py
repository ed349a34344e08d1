"""Differential testing against DuckDB — the local mirror of the
driver's correctness gate (SURVEY.md §5.1).

For every registered query with an oracle: run the Spark DataFrame
and the DuckDB SQL on the same parquet fixtures, then compare
row count, column names, and order-insensitive values (columns
sorted by name, rows sorted by their full value tuple — the same
normalization the driver's value-hash implies).
"""

from __future__ import annotations

import math

import pytest

from ibd_pipeline_spark.queries import all_oracles, all_queries

ORACLES = all_oracles()
QUERIES = all_queries()


def _normalize(value):
    """Make Spark and DuckDB cell values comparable."""
    import datetime
    import decimal

    if isinstance(value, decimal.Decimal):
        return float(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # collapse -0.0 vs 0.0 and FP noise below round() precision
        return round(value + 0.0, 9)
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, list):
        return tuple(_normalize(v) for v in value)
    return value


def _key(row):
    return tuple((v is None, str(type(v)), v) if False else _sortable(v) for v in row)


def _sortable(v):
    if v is None:
        return (0, "")
    return (1, str(v))


def _rows_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=_key), [cols[i] for i in order]


def _dtype_kind(series):
    """Collapse a pandas dtype to the comparison kind the driver's
    canonicalizer distinguishes: ints ('i'), floats ('f'), bools ('b'),
    datetimes ('M'), everything else ('O'). Signed/unsigned widths are
    equivalent; int-vs-float is NOT (the `count_if`-returns-HUGEINT →
    float64 trap that produced the r04 `agg_count_if_bool` hash-FAIL
    while value-level comparison passed 1822 == 1822.0)."""
    import datetime

    k = series.dtype.kind
    if k == "u":
        return "i"
    if k in ("i", "f", "b", "M"):
        return k
    if k == "O":
        sample = series.dropna()
        if len(sample) and all(
            isinstance(v, (datetime.date, datetime.datetime))
            for v in sample.head(5)
        ):
            return "M"
    return "O"


def _check_dtypes(name, sdf, duck, sql):
    """Driver-mirror dtype check: compare pandas dtype kinds per column
    the way the driver's hash canonicalizer sees them."""
    spd = sdf.toPandas()
    dpd = duck.execute(sql).df()
    for col in spd.columns:
        if col not in dpd.columns:
            continue
        sk, dk = _dtype_kind(spd[col]), _dtype_kind(dpd[col])
        # A column that is all-null (or empty) degrades to object/float
        # on either side without carrying information — skip those.
        if spd[col].isna().all() or dpd[col].isna().all():
            continue
        assert sk == dk, (
            f"{name}.{col}: dtype-kind mismatch spark={spd[col].dtype} "
            f"duck={dpd[col].dtype} — driver hash would diverge"
        )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    _check_dtypes(name, sdf, duck, ORACLES[name])

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted, cols = _rows_sorted(spark_cols, spark_rows)
    d_sorted, _ = _rows_sorted(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; cols={cols}; "
        f"first 3: {mismatches[:3]}"
    )


def test_every_query_runs(spark, sf_dir):
    """Queries without oracles must still execute and return a stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


# ---------------------------------------------------------------------------
# Scale parity pass (opt-in, slow): the same differential check at a
# larger SF to catch scale-sensitive dtype/rounding traps before the
# driver does (round-4 lesson: traps can hide at small N). Enable with
#   SPARK_GRAFT_SLOW_SF=/root/testdata/sf0.1 python -m pytest \
#       tests/test_oracle_parity.py -k at_scale -q
# ---------------------------------------------------------------------------
import os as _os

_SLOW_SF = _os.environ.get("SPARK_GRAFT_SLOW_SF")


@pytest.fixture(scope="session")
def duck_slow():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{_SLOW_SF}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.skipif(
    not _SLOW_SF,
    reason="scale parity pass: set SPARK_GRAFT_SLOW_SF=/root/testdata/sf0.1",
)
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_at_scale(name, spark, duck_slow):
    sdf = QUERIES[name](spark, _SLOW_SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_slow.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    _check_dtypes(name, sdf, duck_slow, ORACLES[name])

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted, cols = _rows_sorted(spark_cols, spark_rows)
    d_sorted, _ = _rows_sorted(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatches at {_SLOW_SF}; cols={cols}; "
        f"first 3: {mismatches[:3]}"
    )
