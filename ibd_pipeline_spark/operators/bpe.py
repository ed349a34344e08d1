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
    if checkpoint_dir is not None:
        sample.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    corpus = sample.select(F.split(F.col(text), " ").alias("syms"))
    merges = None
    for rank in range(1, n_merges + 1):
        best = (
            corpus.select(F.explode(adjacent_pairs(F.col("syms"))).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("bigint").alias("pair_freq"))
            .orderBy(F.col("pair_freq").desc(), "pair")
            .limit(1)
            .select(
                F.lit(rank).alias("rank"),
                F.split_part(F.col("pair"), F.lit(MERGE_SEP), F.lit(1)).alias("left"),
                F.split_part(F.col("pair"), F.lit(MERGE_SEP), F.lit(2)).alias("right"),
                "pair_freq",
            )
        )
        best = (
            best.checkpoint(eager=True)
            if checkpoint_dir is not None
            else best.localCheckpoint(eager=True)
        )
        # An exhausted sample (no adjacent pair left, or empty input)
        # yields an EMPTY best — continuing would crossJoin the corpus
        # against zero rows and silently empty it (r05 ADVICE). Stop
        # and return the merges learned so far; raise if the very
        # first round finds nothing to learn from.
        if best.isEmpty():
            if merges is None:
                raise ValueError(
                    "bpe_learn: sample has no adjacent symbol pairs — "
                    "empty sample or all rows single-symbol"
                )
            break
        merges = best if merges is None else merges.unionAll(best)
        corpus = corpus.crossJoin(F.broadcast(best.select("left", "right"))).select(
            merge_pair(F.col("syms"), F.col("left"), F.col("right")).alias("syms")
        )
        corpus = (
            corpus.checkpoint(eager=True)
            if checkpoint_dir is not None
            else corpus.localCheckpoint(eager=True)
        )
    return merges


def bpe_apply(docs: DataFrame, merges: DataFrame, text: str = "text") -> DataFrame:
    """Apply a learned merge table to a corpus in ONE projection: the
    K merges become K nested greedy folds per row, executed in rank
    order (BPE's required priority). The merge table rides in as a
    broadcast one-row array of (left, right) structs; the corpus is
    scanned once, shuffled never.

    Returns the input plus `bpe_syms` (merged symbol array) and
    `n_syms_before` / `n_syms_after`.
    """
    # collect_list gives no cross-partition order guarantee — sort the
    # collected structs by rank and strip it (the registry's
    # in-aggregate struct-sort idiom).
    table = merges.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "left", "right"))),
            lambda s: F.struct(s["left"].alias("left"), s["right"].alias("right")),
        ).alias("mt")
    )
    out = docs.crossJoin(F.broadcast(table))
    syms = F.split(F.col(text), " ")
    applied = F.aggregate(
        F.col("mt"),
        syms,
        lambda acc, m: merge_pair(acc, m["left"], m["right"]),
    )
    return out.select(
        *[c for c in docs.columns],
        applied.alias("bpe_syms"),
        F.size(syms).cast("int").alias("n_syms_before"),
        F.size(applied).cast("int").alias("n_syms_after"),
    )
