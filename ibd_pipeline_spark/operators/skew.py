"""Skew-mitigation join patterns.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit fallback for pathological keys (one key = 30% of a 100 TB
fact table) or for engines/stages where AQE can't help (e.g. the
aggregate feeding the join already skewed, or streaming state).

Pattern: replicate the small side `salt_factor` times (one copy per
salt value), scatter the big side's hot keys across salts with a
random salt column, join on (key, salt). Each hot key's rows spread
over salt_factor tasks instead of one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_factor: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with salting: `big` gets a random salt in
    [0, salt_factor); `small` is exploded to every salt value.
    Result equals big.join(small, big[key]==small[key], how) for
    inner/left joins, with hot-key partitions split salt_factor ways.

    Cost: small side inflates salt_factor× (only acceptable because
    it's the small side — for dim tables this is noise); big side
    gains one int column. Use when a key histogram shows a head key
    above ~1/parallelism of the rows.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn("__salt", (F.rand(seed) * salt_factor).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")
