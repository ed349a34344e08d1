"""Property tests for the BPE operators (operators/bpe.py) — the
correctness evidence for the rows-only registry entry.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.operators.bpe import (
    MERGE_SEP,
    bpe_apply,
    bpe_learn,
    merge_pair,
)


def test_merge_pair_greedy_semantics(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["x", "a", "b", "a", "b", "y"],), ([],)],
        "syms array<string>",
    )
    out = df.select(
        merge_pair(F.col("syms"), F.lit("a"), F.lit("a")).alias("aa"),
        merge_pair(F.col("syms"), F.lit("a"), F.lit("b")).alias("ab"),
    ).collect()
    sep = MERGE_SEP
    # greedy left-to-right, merged symbol can't re-merge in-pass
    assert out[0]["aa"] == [f"a{sep}a", "a"]
    assert out[1]["ab"] == ["x", f"a{sep}b", f"a{sep}b", "y"]
    assert out[2]["aa"] == []


def test_learn_is_deterministic_and_ranked(spark):
    docs = spark.createDataFrame(
        [("k v k v k v",), ("k v z z",), ("z z k v",)], "text string"
    )
    m1 = bpe_learn(docs, n_merges=3).collect()
    m2 = bpe_learn(docs, n_merges=3).collect()
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    assert [r["rank"] for r in m1] == [1, 2, 3]
    # most frequent adjacent pair in the toy corpus is (k, v): 5 occurrences
    assert (m1[0]["left"], m1[0]["right"]) == ("k", "v")
    assert m1[0]["pair_freq"] == 5


def test_apply_shrinks_and_reconstructs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    merges = bpe_learn(docs, n_merges=4)
    applied = bpe_apply(docs, merges)
    rows = applied.select(
        "text",
        "bpe_syms",
        "n_syms_before",
        "n_syms_after",
        F.array_join(
            F.transform(
                "bpe_syms", lambda s: F.replace(s, F.lit(MERGE_SEP), F.lit(" "))
            ),
            " ",
        ).alias("rejoined"),
    ).collect()
    assert rows
    shrank = 0
    for r in rows:
        # merging never grows the sequence, and is lossless: splitting
        # the merge separator back to spaces reconstructs the text
        assert r["n_syms_after"] <= r["n_syms_before"]
        assert r["rejoined"] == r["text"]
        shrank += int(r["n_syms_after"] < r["n_syms_before"])
    # the learned merges must actually fire on the corpus they came from
    assert shrank > 0


def test_apply_zero_merges_is_identity(spark):
    docs = spark.createDataFrame([("p q r",)], "text string")
    empty = bpe_learn(docs, n_merges=1).filter("rank < 1")
    out = bpe_apply(docs, empty).collect()[0]
    assert out["bpe_syms"] == ["p", "q", "r"]
    assert out["n_syms_before"] == out["n_syms_after"] == 3


def test_learn_stops_when_sample_exhausted(spark):
    """Asking for more merges than the sample contains returns the
    merges actually learnable — the corpus is never emptied by a
    crossJoin against an empty best (r05 ADVICE)."""
    from ibd_pipeline_spark.operators.bpe import bpe_learn

    # one row, two symbols -> exactly 1 learnable merge
    sample = spark.createDataFrame([("a b",)], "text string")
    merges = bpe_learn(sample, n_merges=5).collect()
    assert len(merges) == 1
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "b")


def test_learn_raises_on_unlearnable_sample(spark):
    """An empty sample (or all single-symbol rows) has no adjacent
    pairs at all: loud error, not a silent None."""
    import pytest

    from ibd_pipeline_spark.operators.bpe import bpe_learn

    sample = spark.createDataFrame([("solo",)], "text string")
    with pytest.raises(ValueError, match="no adjacent symbol pairs"):
        bpe_learn(sample, n_merges=3)


def test_apply_regex_path_equals_fold_path(spark):
    """The string/regex apply (bpe_apply) must agree with the
    array-fold reference (merge_pair) on every doc — including
    symbols that are regex metacharacters, contain backslashes,
    dollar signs, or the literal sequence \\E, and greedy repeat
    runs."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            ("a b a b a",),
            ("a a a a",),               # greedy repeats
            ("x.y x.y [z] [z]",),       # regex metachars
            ("$1 \\ $1 \\",),           # replacement metachars
            ("q\\E q\\E end",),         # \E inside a symbol
            ("solo",),
            ("a b",),
        ],
        "text string",
    )
    merges = spark.createDataFrame(
        [
            (1, "a", "b"),
            (2, "a", "a"),
            (3, "x.y", "x.y"),
            (4, "[z]", "[z]"),
            (5, "$1", "\\"),
            (6, "q\\E", "q\\E"),
        ],
        "rank int, left string, right string",
    )
    out = bpe_apply(docs, merges).select("text", "bpe_syms").collect()
    # fold reference: apply merge_pair sequentially in rank order
    ref_col = F.split("text", " ")
    for r in merges.orderBy("rank").collect():
        ref_col = merge_pair(ref_col, F.lit(r["left"]), F.lit(r["right"]))
    ref = {
        r["text"]: r["ref"]
        for r in docs.select("text", ref_col.alias("ref")).collect()
    }
    for r in out:
        assert r["bpe_syms"] == ref[r["text"]], r["text"]
