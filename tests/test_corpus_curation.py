"""Corpus-curation operators: Gopher filter, repetition metrics,
decontamination, connected-components dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import text as TX
from opentelemetry_collector_contrib_spark.operators.graph import (
    connected_components,
    dedup_keep_representative,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over a lazy dog and that is it really truly "
            "another few words here to cross the twenty word minimum line"),
        (2, ""),                       # empty
        (3, "x " * 30),                # repetitive single token, no stopwords
        (4, "### ... ### ... " * 10),  # symbol soup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_filter_rules(docs):
    out = {r["doc_id"]: r.asDict() for r in TX.gopher_filter(docs, "doc_id", "text").collect()}
    assert out[1]["keep"] is True
    # empty doc: everything zero, fails word count + stopwords, never null
    assert out[2]["n_words"] == 0 and out[2]["keep"] is False
    assert out[2]["avg_word_len"] == 0.0
    # repetitive doc passes alpha but fails stopword + avg-word-len rules
    assert out[3]["rule_stopwords"] is False
    assert out[3]["rule_avg_word_len"] is False
    # symbol soup fails the symbol-to-word ratio and alpha rules
    assert out[4]["rule_symbol_ratio"] is False
    assert out[4]["rule_alpha_words"] is False


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "all words differ entirely here"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in TX.repetition_metrics(df, "doc_id", "text").collect()}
    # 'a b a b a b': 2-grams = [ab, ba, ab, ba, ab] -> distinct 2 of 5
    assert out[1]["dup_2gram_frac"] == pytest.approx(0.6)
    assert out[1]["top_2gram_frac"] == pytest.approx(0.6)  # 'a b' x3 / 5
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[3]["dup_2gram_frac"] == 0.0 and out[3]["top_2gram_frac"] == 0.0


@pytest.mark.parametrize("broadcast", [True, False])
def test_decontam_overlap(spark, broadcast):
    corpus = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "totally unrelated words only")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "zz one two three four five yy")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in TX.decontam_overlap(
            corpus, bench, "doc_id", "text", shingle_n=5, broadcast_bench=broadcast
        ).collect()
    }
    # doc 1 shares the 5-gram 'one two three four five'
    assert out[1]["contaminated"] is True and out[1]["overlap_ngrams"] == 1
    assert out[2]["contaminated"] is False and out[2]["overlap_ngrams"] == 0


def test_connected_components_transitive(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: one component each
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r["vertex"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_keep_representative(spark):
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_representative(docs, pairs).collect()
    )
    # one per cluster (min id) + the unpaired doc
    assert kept == [1, 10, 99]
