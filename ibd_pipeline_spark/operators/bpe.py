"""Byte-pair-encoding merge learning and application, all-DataFrame
(round 5, wave 3). Completes the tokenizer-training story started by
`train_bpe_pair_counts` (the single merge-step statistic): LEARN the
top-K greedy merges, then APPLY them corpus-wide.

The two phases have fundamentally different shapes, and the split is
the scale design:

- **learn** is inherently iterative (each round's pair counts depend
  on the previous round's merge), so it runs on a SAMPLE — which is
  how production tokenizer trainers work too — with the sample
  re-materialized (checkpointed) per round. Per round: one
  adjacent-pair explode + hash agg + a 1-row argmax, then a per-row
  greedy fold applying the winning merge.
- **apply** is per-row only: all K learned merges execute as K nested
  greedy folds inside ONE projection — no shuffle, no iteration, no
  state; the full 100 TB corpus pays a single scan however many
  merges were learned.

Symbols here are whitespace tokens (the registry tokenizer
convention) rather than characters — the fixture corpus is word soup
— but the algebra is symbol-agnostic: swap the initial split and the
same operators learn character-level BPE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MERGE_SEP = "▁"  # ▁ — joins merged symbol pairs, absent from the corpus


def adjacent_pairs(syms: Column) -> Column:
    """All adjacent symbol pairs of an array, as 'a▁b' strings."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(MERGE_SEP), b),
    )


def merge_pair(syms: Column, a: Column, b: Column) -> Column:
    """One greedy left-to-right merge pass: every non-overlapping
    occurrence of adjacent (a, b) becomes the single symbol 'a▁b'.
    A fold — acc ends with `a` and the next symbol is `b` ⇒ replace
    the tail; the merged symbol can't re-merge in the same pass, which
    is exactly BPE's greedy semantics on repeats (aaa + (a,a) → [aa, a]).
    """
    merged = F.concat(a, F.lit(MERGE_SEP), b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    sample: DataFrame,
    text: str = "text",
    n_merges: int = 6,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Learn the top-`n_merges` greedy BPE merges from a sample
    corpus. Returns an n_merges-row DataFrame (rank, left, right,
    pair_freq) — the merge table, in learning order.

    Per round the sample corpus (as symbol arrays) is eagerly
    checkpointed — its lineage otherwise accrues one fold per round
    over the whole sample. Ties on pair frequency break
    lexicographically, so the merge table is deterministic.
    """
    from ibd_pipeline_spark.operators.ckpt import RoundCheckpointer

    spark = sample.sparkSession
    ckpt = RoundCheckpointer(spark, checkpoint_dir)
    corpus = sample.select(F.split(F.col(text), " ").alias("syms"))
    # r15: the per-round best pair is MODEL STATE (one row) — collect
    # it to the driver (the kmeans/logreg driver-state precedent)
    # instead of reliable-checkpointing six 1-row frames + isEmpty
    # actions + a crossJoin per round; the merge table returns as one
    # driver-local frame with identical values/schema. The corpus
    # truncation cadence is unchanged.
    rows: "list[tuple]" = []
    for rank in range(1, n_merges + 1):
        got = (
            corpus.select(F.explode(adjacent_pairs(F.col("syms"))).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("bigint").alias("pair_freq"))
            .orderBy(F.col("pair_freq").desc(), "pair")
            .limit(1)
            .select(
                F.split_part(F.col("pair"), F.lit(MERGE_SEP), F.lit(1)).alias("left"),
                F.split_part(F.col("pair"), F.lit(MERGE_SEP), F.lit(2)).alias("right"),
                "pair_freq",
            )
            .collect()
        )
        # An exhausted sample (no adjacent pair left, or empty input)
        # yields an EMPTY best — stop and return the merges learned so
        # far; raise if the very first round finds nothing to learn
        # from (r05 ADVICE).
        if not got:
            if not rows:
                raise ValueError(
                    "bpe_learn: sample has no adjacent symbol pairs — "
                    "empty sample or all rows single-symbol"
                )
            break
        left, right, freq = got[0]["left"], got[0]["right"], got[0]["pair_freq"]
        rows.append((rank, left, right, freq))
        corpus = corpus.select(
            merge_pair(F.col("syms"), F.lit(left), F.lit(right)).alias("syms")
        )
        # Truncate the sample corpus every 2nd round and on the last
        # (the pagerank cadence): an un-truncated round just leaves one
        # extra in-memory fold in the next round's agg lineage — same
        # compute, half the checkpoint jobs/writes.
        if rank % 2 == 0 or rank == n_merges:
            corpus = ckpt(corpus, "corpus")
    ckpt.release("corpus")
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_freq bigint"
    )


_STR_SEP = "\x1f"  # unit separator: joins symbols for the string-form passes


def _java_rx_quote(sym: str) -> str:
    """Pattern.quote a symbol for embedding in a Java regex: wrap in
    \\Q…\\E, splicing any literal '\\E' inside the symbol."""
    return "\\Q" + sym.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _java_rx_repl(sym: str) -> str:
    """Escape a literal string for a Java regex REPLACEMENT (backslash
    and $ are the only metacharacters there)."""
    return sym.replace("\\", "\\\\").replace("$", "\\$")


def bpe_apply(docs: DataFrame, merges: DataFrame, text: str = "text") -> DataFrame:
    """Apply a learned merge table to a corpus in ONE projection: the
    K merges become K chained compiled-once regexp passes over the
    \\x1f-joined symbol string, executed in rank order (BPE's
    required priority). Java's regexp_replace substitutes
    non-overlapping matches LEFT TO RIGHT and resumes after each
    replacement — exactly BPE's greedy semantics per pass, including
    repeats (aaa + (a,a) → [aa, a]); equivalence with the
    array-fold form (merge_pair) is property-tested, fold vs regex,
    including regex-metacharacter symbols.

    Why strings, not the array fold: the fold rebuilds its
    accumulator array per element — O(L²) copies per row per merge,
    the dominant cost of the corpus-wide apply (measured ~4 s of the
    6 s sf0.1 pass). Each regex pass is one linear scan with a
    pattern compiled once per partition (literal pattern → codegen
    constant), so a 100 TB corpus pays K linear scans inside one
    projection — no shuffle, no iteration.

    The merge table is fetched to the driver first (K rows of model
    state, the logreg weight-fetch class — NOT a data collect) so
    the patterns are literals; merges must carry (rank, left, right).

    Returns the input plus `bpe_syms` (merged symbol array) and
    `n_syms_before` / `n_syms_after`.
    """
    mrows = sorted(
        merges.select("rank", "left", "right").collect(),
        key=lambda r: r["rank"],
    )
    syms = F.split(F.col(text), " ")
    joined = F.concat_ws(_STR_SEP, syms)
    for r in mrows:
        pat = (
            "(^|" + _STR_SEP + ")"
            + _java_rx_quote(r["left"])
            + _STR_SEP
            + _java_rx_quote(r["right"])
            + "(?=" + _STR_SEP + "|$)"
        )
        rep = "$1" + _java_rx_repl(r["left"] + MERGE_SEP + r["right"])
        joined = F.regexp_replace(joined, pat, rep)
    applied = F.split(joined, _STR_SEP)
    return docs.select(
        *[c for c in docs.columns],
        applied.alias("bpe_syms"),
        F.size(syms).cast("int").alias("n_syms_before"),
        F.size(applied).cast("int").alias("n_syms_after"),
    )
