"""Stream-static enrichment joins.

The standard streaming-ETL shape the reference never needed (its one
stream carries a single location, `spark_processor.py:76-78`): join a
live stream against a dimension table — user → segment, device →
model, location → site metadata — without any streaming state. The
engine treats the static side as a fresh subquery in EVERY micro-batch,
so there is no watermark, no state store, and no TTL involved.

Operational nuance worth stating precisely: because the static plan
re-executes per micro-batch, a dimension backed by a parquet path that
is atomically replaced IS picked up on the next batch (poor man's
slowly-changing dim); `dim.cache()` pins one snapshot for the query's
lifetime instead. Inner and left-outer joins need no watermark; right/
full outer against a stream are unsupported by the engine (they would
need to emit "static row never matched", which is unknowable without
end-of-stream).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | str,
    how: str = "left_outer",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame with a static dimension.

    `broadcast_dim=True` hints the dim side (the overwhelmingly common
    case — dimensions fit in executor memory; every micro-batch then
    joins map-side with zero shuffle of the stream). With a huge dim,
    pass False and pre-bucket BOTH sides on the join key so the
    per-batch shuffle is bounded.
    """
    if how in ("right", "right_outer", "full", "full_outer"):
        raise ValueError(
            f"stream-static {how} join is not defined: unmatched static rows "
            "are unknowable mid-stream; use left_outer from the stream side"
        )
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on=on, how=how)
