"""Unit tests for bpe_encode (merge application semantics) and
dsir_weights (importance-weight direction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.text import (
    bpe_encode,
    dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_bpe_encode_applies_merges_in_order(spark):
    df = _docs(spark, [(1, "the then other", "en")])
    out = bpe_encode(df, [("t", "h"), ("th", "e")]).collect()[0]
    # the -> th+e -> the ; then -> th+e -> the,n ; other -> o,t,h,e,r -> o,th,e -> o,the,r
    assert out["bpe_text"] == "the the n o the r"
    assert out["n_bpe_tokens"] == 6


def test_bpe_encode_adjacent_repeats_need_passes(spark):
    # 'thth' = t h t h: a single replace pass consumes the shared
    # delimiter; the repeated pass must still merge the second pair
    df = _docs(spark, [(1, "thththth", "en")])
    out = bpe_encode(df, [("t", "h")], passes=4).collect()[0]
    assert out["bpe_text"] == "th th th th"
    assert out["n_bpe_tokens"] == 4


def test_bpe_encode_empty_and_punct(spark):
    df = _docs(spark, [(1, "", "en"), (2, "a  b", "en")])
    rows = {r["doc_id"]: r for r in bpe_encode(df, [("a", "b")]).collect()}
    assert rows[1]["n_bpe_tokens"] == 0 and rows[1]["bpe_text"] == ""
    # 'a' and 'b' are separate WORDS — no cross-word merge
    assert rows[2]["bpe_text"] == "a b" and rows[2]["n_bpe_tokens"] == 2


def test_dsir_weights_prefer_target_like_docs(spark):
    # target docs use one vocabulary, raw-only docs another; a doc made
    # of target vocabulary must outscore one made of raw-only vocabulary
    rows = [(i, "alpha beta gamma delta", "en") for i in range(8)]
    rows += [(100 + i, "zonk quux blarg wibble", "de") for i in range(8)]
    rows += [(200, "alpha beta gamma delta", "de"),
             (201, "zonk quux blarg wibble", "de")]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r["dsir_w"]
           for r in dsir_weights(df, F.col("lang") == "en", buckets=64).collect()}
    assert out[200] > out[201]
    # target-vocab doc weight positive, raw-only-vocab negative
    assert out[200] > 0 > out[201]


def test_bpe_encode_self_overlap_documented_divergence(spark):
    # pin the DOCUMENTED divergence: replace-all pairs 'aaaaa'
    # differently from leftmost-greedy BPE ([aa, aa, a])
    df = _docs(spark, [(1, "aaaaa", "en")])
    out = bpe_encode(df, [("a", "a")], passes=4).collect()[0]
    assert out["bpe_text"] == "aa a aa"
    assert out["n_bpe_tokens"] == 3
