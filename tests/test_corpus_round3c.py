"""Round-3 batch-C ops: unigram-LM scoring, duplicated-span detection,
token-budget data mixing, SemDeDup, streaming cumulative->delta.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.similarity import (
    semantic_dedup,
)
from opentelemetry_collector_contrib_spark.operators.text import (
    dup_spans,
    mix_sources,
    unigram_nll,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "a a b", "en"),
        (1, "b c", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_unigram_nll_hand_computed(docs):
    out = {r.doc_id: r for r in unigram_nll(docs).collect()}
    # corpus: a=2, b=2, c=1, total=5
    # doc0 = (a a b): -(2 ln(2/5) + ln(2/5)) / 3 = -ln(2/5)
    assert out[0].n_tokens == 3
    assert out[0].nll == pytest.approx(-math.log(2 / 5), abs=1e-6)
    # doc1 = (b c): -(ln(2/5) + ln(1/5)) / 2
    assert out[1].n_tokens == 2
    assert out[1].nll == pytest.approx(
        -(math.log(2 / 5) + math.log(1 / 5)) / 2, abs=1e-6
    )


def test_unigram_nll_boilerplate_scores_low(spark):
    # ten copies of the same doc + one unique doc: the repeated doc's
    # tokens dominate the LM, so its NLL is far lower
    rows = [(i, "the quick brown fox jumps") for i in range(10)]
    rows.append((99, "zebra quark vortex glyph nimbus"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.nll for r in unigram_nll(df).collect()}
    assert out[0] < out[99]


def test_dup_spans_finds_seeded_span(spark):
    shared = "one two three four"  # 4 tokens, k=3 -> 2 shared windows
    rows = [
        (0, f"{shared} alpha beta gamma"),
        (1, f"delta {shared} epsilon"),
        (2, "zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dup_spans(df, k=3).collect()}
    # doc0: tokens=7 -> 5 windows; shared k-windows of 'one two three
    # four' = 'one two three','two three four' (both also in doc1)
    assert out[0].n_windows == 5 and out[0].dup_windows == 2
    assert out[1].n_windows == 4 and out[1].dup_windows == 2
    assert out[2].dup_windows == 0 and out[2].dup_frac == 0.0
    assert out[0].dup_frac == pytest.approx(2 / 5)


def test_dup_spans_short_docs_dropped(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "x y z")], ["doc_id", "text"])
    out = dup_spans(df, k=3).collect()
    assert {r.doc_id for r in out} == {1}  # doc0 has no 3-window


def test_mix_sources_rates_and_budget(spark):
    # en: 8 docs x 10 tokens; de: 2 docs x 10 tokens. total=100.
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(10)), "en") for i in range(8)]
    rows += [(10 + i, " ".join(f"d{i}w{j}" for j in range(10)), "de") for i in range(2)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r.source: r
        for r in mix_sources(
            df, {"en": 0.5, "de": 0.5}, budget_frac=0.5, strata_col="lang"
        ).collect()
    }
    # budget B = 50 tokens; en rate = 0.5*50/80 = 0.3125; de = min(1, 25/20)=1
    assert out["de"].rate == 1.0
    assert out["de"].kept_docs == 2 and out["de"].kept_tokens == 20
    assert out["en"].rate == pytest.approx(0.3125)
    assert 0 <= out["en"].kept_docs <= 8
    assert out["en"].kept_tokens == out["en"].kept_docs * 10


def test_mix_sources_zero_weight_drops_source(spark):
    df = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "d e f", "xx")], ["doc_id", "text", "lang"]
    )
    out = {r.source: r for r in mix_sources(df, {"en": 1.0}, strata_col="lang").collect()}
    assert out["xx"].kept_docs == 0 and out["xx"].rate == 0.0


def test_semantic_dedup_keeps_min_id(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),  # exact dup of 0
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = {r.vec_id: r for r in semantic_dedup(df, k=2, threshold=0.99).collect()}
    assert out[0].keep and out[0].dup_of is None
    assert not out[1].keep and out[1].dup_of == 0
    assert out[2].keep


def test_stream_c2d_matches_batch_lag(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.streaming.pipeline import (
        stream_cumulative_to_delta,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 100, 10.0),
        (2, "2024-01-01 00:01:00", 100, 13.5),
        (3, "2024-01-01 00:02:00", 100, 13.0),
        (4, "2024-01-01 00:00:30", 200, 5.0),
        (5, "2024-01-01 00:01:30", 200, 9.0),
    ]
    df = (
        spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    feed = str(tmp_path / "feed")
    df.write.parquet(feed)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(feed)
    q = (
        stream_cumulative_to_delta(stream, ["user_id"])
        .writeStream.format("memory")
        .queryName("c2d_t")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.value_delta for r in spark.table("c2d_t").collect()}
    assert got == {1: None, 2: 3.5, 3: -0.5, 4: None, 5: 4.0}


def test_pq_encode_recovers_block_structure(spark):
    from opentelemetry_collector_contrib_spark.operators.similarity import (
        pq_encode,
    )

    # 4-dim vectors, 2 blocks of 2: vectors 0/1 seed the two codewords
    # per block; 2 and 3 repeat the seed patterns and must get the
    # seed's code in each block
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [0.0, 1.0, 1.0, 0.0]),
        (2, [1.0, 0.0, 1.0, 0.0]),  # block0 like vec0, block1 like vec1
        (3, [0.0, 1.0, 0.0, 1.0]),  # block0 like vec1, block1 like vec0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = {r.vec_id: (r.c0, r.c1) for r in pq_encode(df, dim=4, m=2, ksub=2).collect()}
    assert out[0] == (0, 0) and out[1] == (1, 1)
    assert out[2] == (0, 1) and out[3] == (1, 0)


def test_bpe_merge_candidates_hand_computed(spark):
    from opentelemetry_collector_contrib_spark.operators.text import (
        bpe_merge_candidates,
    )

    df = spark.createDataFrame([(0, "abab ab"), (1, "ab cd")], ["doc_id", "text"])
    # pairs: 'abab' -> ab,ba,ab; 'ab' -> ab; 'ab' -> ab; 'cd' -> cd
    out = [(r.pair, r.cnt, r.rank) for r in bpe_merge_candidates(df, k=3).collect()]
    assert out == [("ab", 4, 1), ("ba", 1, 2), ("cd", 1, 3)]


def test_dup_spans_exempt_first_keeps_canonical_owner(spark):
    shared = "one two three four five six"  # 6 tokens, k=3 -> 4 windows
    rows = [(0, shared), (1, shared), (2, "zeta eta theta iota kappa")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dup_spans(df, k=3, exempt_first=True).collect()}
    # doc0 owns every shared window (smallest id) -> clean; doc1 is
    # the copy -> fully duplicated; a threshold filter keeps exactly
    # one representative
    assert out[0].dup_windows == 0
    assert out[1].dup_windows == out[1].n_windows == 4
    assert out[2].dup_windows == 0


def test_stream_c2d_late_row_does_not_move_state_back(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.streaming.pipeline import (
        stream_cumulative_to_delta,
    )

    schema = "event_id long, ts timestamp, user_id long, value double"
    feed = str(tmp_path / "feed2")
    batch1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, 10.0), (2, "2024-01-01 00:02:00", 7, 14.0)],
        ["event_id", "ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch1.write.parquet(feed)

    sink = str(tmp_path / "sink2")

    def run_once():
        q = (
            stream_cumulative_to_delta(
                spark.readStream.schema(schema).parquet(feed), ["user_id"]
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second batch: one late row (ts before the stored last point)
    late = spark.createDataFrame(
        [(3, "2024-01-01 00:01:00", 7, 99.0)],
        ["event_id", "ts", "user_id", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late.write.mode("append").parquet(feed)
    run_once()
    got = {r.event_id: r.value_delta for r in spark.read.parquet(sink).collect()}
    assert got[1] is None and got[2] == 4.0
    assert got[3] is None  # late row gets NULL, not 99-14


def test_quality_classifier_orders_prose_above_salad(spark):
    from opentelemetry_collector_contrib_spark.operators.text import (
        quality_classifier,
    )

    rows = [
        (0, "the cat sat on the mat and the dog was in the house"),
        (1, "x9 q7 zz@@ ## 04 %% !! ~~ ^^"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert out[0].quality_prob > out[1].quality_prob
    assert out[0].keep
    assert 0.0 <= out[1].quality_prob <= 1.0


def test_pq_adc_finds_exact_twin(spark):
    from opentelemetry_collector_contrib_spark.operators.similarity import (
        pq_adc_top1,
    )

    # vec 4 is an exact copy of vec 0: ADC must pick it as vec 0's
    # neighbor (and vice versa) since they share every codeword
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [0.0, 1.0, 1.0, 0.0]),
        (2, [1.0, 1.0, 0.5, 0.5]),
        (3, [0.5, 0.5, 1.0, 1.0]),
        (4, [1.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = {
        r.query_id: r
        for r in pq_adc_top1(df, dim=4, m=2, ksub=2, n_queries=5).collect()
    }
    # query 4: twin vec 0 wins (any same-codeword tie breaks to min id)
    assert out[4].neighbor_id == 0
    # query 0: ADC cannot distinguish candidates sharing the twin's
    # codes — the winner's score must EQUAL the twin's (same lookups)
    assert out[0].adc_score == out[4].adc_score
    assert len(out) == 5 and all(r.neighbor_id != q for q, r in out.items())
