"""Round-4 operator tests: true IVFADC and the in-engine-trained
quality classifier."""
import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.similarity import (
    ivfadc_topk,
    pq_adc_top1,
)
from opentelemetry_collector_contrib_spark.operators.text import (
    quality_classifier,
    quality_classifier_train,
)


def _vecs(spark, n=40, dim=8, clusters=4):
    # deterministic clustered vectors: cluster c points near axis c
    rows = []
    for i in range(n):
        c = i % clusters
        v = [0.05 * ((i * 7 + j) % 5) for j in range(dim)]
        v[c] += 3.0 + 0.01 * i
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivfadc_probed_equals_flat_adc_when_probing_all_cells(spark):
    # nprobe == kc means every candidate is scored -> identical top-1
    # to the flat ADC scan (same codebooks, same rounding)
    emb = _vecs(spark)
    flat = {
        r["query_id"]: (r["neighbor_id"], r["adc_score"])
        for r in pq_adc_top1(
            emb, dim=8, m=2, ksub=2, iters=2, n_queries=4
        ).collect()
    }
    ivf = {
        r["query_id"]: (r["neighbor_id"], r["adc_score"])
        for r in ivfadc_topk(
            emb, dim=8, m=2, ksub=2, kc=3, iters=2, nprobe=3, n_queries=4, k=1
        ).collect()
    }
    assert ivf == flat


def test_ivfadc_plan_has_no_cross_join(spark):
    emb = _vecs(spark)
    plan = ivfadc_topk(
        emb, dim=8, m=2, ksub=2, kc=3, iters=2, nprobe=1, n_queries=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfadc_respects_nprobe(spark):
    # with nprobe=1 every returned neighbor shares the query's probed
    # cell; results are a subset of flat-ADC candidates
    emb = _vecs(spark)
    out = ivfadc_topk(
        emb, dim=8, m=2, ksub=2, kc=4, iters=2, nprobe=1, n_queries=4, k=2
    ).collect()
    assert all(r["rank"] <= 2 for r in out)
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_quality_classifier_train_learns_separable_labels(spark):
    # long prose docs (label 1) vs short junk (label 0): training must
    # move the weights off zero and classify better than the 0.5 init
    prose = (
        "the quick brown fox jumps over a lazy dog and it is a fine day "
        "to walk in the park with friends and family "
    )
    rows = [(i, prose * 3) for i in range(30)]
    rows += [(100 + i, "@@@@ #### %%%% 1234") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.length("text") > 100
    bias, w = quality_classifier_train(docs, label, lr=1.0, iters=4)
    assert any(abs(v) > 1e-6 for v in w.values())
    scored = quality_classifier(docs, weights=w, bias=bias)
    joined = scored.join(docs, "doc_id").withColumn(
        "y", (F.length("text") > 100).cast("int")
    )
    acc = joined.filter(
        F.col("keep").cast("int") == F.col("y")
    ).count() / joined.count()
    assert acc >= 0.9


def test_quality_classifier_train_deterministic(spark):
    rows = [(i, f"some text {i} the a of and is to in") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.col("doc_id") % 2 == 0
    r1 = quality_classifier_train(docs, label, iters=2)
    r2 = quality_classifier_train(docs.repartition(7), label, iters=2)
    # exact-decimal gradient sums: partitioning cannot change the fit
    assert r1 == r2


def test_semdedup_oversized_cell_salting(spark):
    from opentelemetry_collector_contrib_spark.operators.similarity import (
        lsh_bucket,
        semantic_dedup,
    )

    dim = 8
    rows = []
    # one giant cluster along +e0 with sign-diverse tails (so the LSH
    # salt actually splits it), duplicate pairs planted as (2i, 2i+1)
    # e0 small enough that any tail difference drops cosine below the
    # threshold: worst non-dup pair (one flipped bit) has
    # cos = (1 + 1.25) / (1 + 1.75) ~= 0.82 < 0.95; identical = 1.0
    for i in range(60):
        tail = [0.5 if (i >> j) & 1 else -0.5 for j in range(dim - 1)]
        v = [1.0] + tail
        rows.append((2 * i, v))
        rows.append((2 * i + 1, list(v)))  # exact duplicate
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    plain = semantic_dedup(df, k=1, iters=1, threshold=0.95)
    salted = semantic_dedup(
        df, k=1, iters=1, threshold=0.95, max_cell_size=20, dim=dim
    )
    p = {r["vec_id"]: (r["keep"], r["dup_of"]) for r in plain.collect()}
    s = {r["vec_id"]: (r["keep"], r["dup_of"]) for r in salted.collect()}
    # identical vectors share an LSH bucket, so every planted dup pair
    # survives the sub-split: salted == unsalted on this fixture
    assert s == p
    for i in range(60):
        assert s[2 * i] == (True, None)
        assert s[2 * i + 1] == (False, 2 * i)

    # and the salt genuinely splits the giant cell: >1 distinct bucket
    import pyspark.sql.functions as F

    nb = (
        df.select(lsh_bucket(F.col("embedding"), 4, dim).alias("b"))
        .distinct()
        .count()
    )
    assert nb > 1


def test_pq_train_fused_equals_per_block_lloyd(spark):
    # the fused trainer must be bit-identical to m independent
    # kmeans_lloyd runs over the block slices (the r3 sequential form
    # and the shape every PQ oracle replays)
    from opentelemetry_collector_contrib_spark.operators.similarity import (
        kmeans_lloyd,
        pq_train,
    )

    emb = _vecs(spark, n=50, dim=8)
    fused = pq_train(emb, dim=8, m=2, ksub=3, iters=3)
    sub = 4
    for b in range(2):
        block = emb.select(
            "vec_id",
            F.slice(F.col("embedding").cast("array<double>"), b * sub + 1, sub).alias("__bv"),
        )
        _, cents = kmeans_lloyd(block, k=3, iters=3, vec_col="__bv")
        assert fused[b] == cents
