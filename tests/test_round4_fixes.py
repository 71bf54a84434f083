"""Round-4 regression tests for the ADVICE.md (r3) findings and the
VERDICT r3 recombine-defaults item.

1. translate_keys collision: renamed value beats pass-through target
   (schemaprocessor migrate/attributes.go Do).
2. assign_keys on_error='send' keeps the original field (stanza
   transformer.go returns an error and the entry keeps its field).
3. recombine is_last_entry + max_unmatched_batch_size: unmatched cap
   applies until the match row (transformer.go:190 cumulative
   matchDetected).
4. stratified_sample threshold rounding is HALF_UP (one convention
   with mix_rates / F.round).
5. pack_sequences shards string ids via xxhash64, not a NULL pmod.
6. recombine defaults mirror reference config defaults
   (transformer/recombine/config.go:40 max_batch_size=1000).
"""
import inspect

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.aggregate import recombine
from opentelemetry_collector_contrib_spark.operators.schema import translate_keys
from opentelemetry_collector_contrib_spark.operators.text import (
    pack_sequences,
    stratified_sample,
)


# -- 1. translate_keys renamed-priority collisions ---------------------------


def test_translate_keys_renamed_value_wins_regardless_of_order(spark):
    renames = {"net.peer.ip": "net.sock.peer.addr"}
    df = spark.createDataFrame(
        [
            # old key BEFORE target key: renamed value must still win
            (1, [("net.peer.ip", "10.0.0.1"), ("net.sock.peer.addr", "stale")]),
            # old key AFTER target key
            (2, [("net.sock.peer.addr", "stale"), ("net.peer.ip", "10.0.0.2")]),
            # no collision: plain rename
            (3, [("net.peer.ip", "10.0.0.3")]),
        ],
        "id int, kv array<struct<k string, v string>>",
    ).select("id", F.map_from_entries("kv").alias("attrs"))
    out = {
        r["id"]: r["attrs"]
        for r in df.select(
            "id", translate_keys(F.col("attrs"), renames).alias("attrs")
        ).collect()
    }
    assert out[1] == {"net.sock.peer.addr": "10.0.0.1"}
    assert out[2] == {"net.sock.peer.addr": "10.0.0.2"}
    assert out[3] == {"net.sock.peer.addr": "10.0.0.3"}


def test_translate_keys_two_sources_same_target(spark):
    # two sources mapping to one target, both present: a renamed value
    # wins over the pass-through, deterministically
    renames = {"db.cassandra.keyspace": "db.name", "db.hbase.namespace": "db.name"}
    df = spark.createDataFrame(
        [(1, [("db.name", "stale"), ("db.cassandra.keyspace", "ks")])],
        "id int, kv array<struct<k string, v string>>",
    ).select("id", F.map_from_entries("kv").alias("attrs"))
    out = df.select(translate_keys(F.col("attrs"), renames).alias("a")).first()["a"]
    assert out == {"db.name": "ks"}


# -- 3. recombine is_last_entry unmatched cap --------------------------------


def test_recombine_last_entry_unmatched_cap_applies_until_match(spark):
    # 7 rows, terminator at row 7, max_unmatched_batch_size=3,
    # max_batch_size large: reference flushes after 3 and 6 unmatched
    # rows, then the match row flushes -> batches of [3, 3, 1]
    rows = [("s", i, "END" if i == 7 else f"l{i}") for i in range(1, 8)]
    df = spark.createDataFrame(rows, "src string, idx int, text string")
    out = recombine(
        df,
        source_cols=["src"],
        order_col="idx",
        is_last_entry=F.col("text") == "END",
        combine_col="text",
        combine_with="|",
        max_batch_size=100,
        max_unmatched_batch_size=3,
    ).orderBy("text")
    got = [(r["text"], r["recombined_count"]) for r in out.collect()]
    assert sorted(got) == [("END", 1), ("l1|l2|l3", 3), ("l4|l5|l6", 3)]


# -- 4. stratified_sample HALF_UP rounding -----------------------------------


def test_stratified_sample_threshold_half_up(spark):
    # rate*65536 == 2.5: HALF_UP -> cutoff "0003"; Python round()
    # (half-even) would give "0002".  md5("36492") starts "0002" so it
    # is kept only under HALF_UP; md5("151094") starts "0003" (out
    # either way); md5("115298") starts "0001" (in either way).
    rate = 2.5 / 65536
    df = spark.createDataFrame(
        [(36492, "en"), (151094, "en"), (115298, "en")], "doc_id long, lang string"
    )
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": rate}).collect()
    }
    assert kept == {36492, 115298}


# -- 5. pack_sequences string ids --------------------------------------------


def test_pack_sequences_string_ids_shard_by_hash(spark):
    df = spark.createDataFrame(
        [(f"conv-{i:04d}", "tok " * (i % 7 + 1)) for i in range(64)],
        "doc_id string, text string",
    )
    out = pack_sequences(df, budget=16, shards=8).collect()
    shards = {r["shard"] for r in out}
    assert None not in shards
    assert all(0 <= s < 8 for s in shards)
    assert len(shards) > 1  # not collapsed into a single NULL shard
    assert sum(r["n_docs"] for r in out) == 64


def test_pack_sequences_numeric_ids_unchanged(spark):
    # numeric path stays id % shards (the oracle-replayable contract)
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(16)], "doc_id long, text string"
    )
    out = pack_sequences(df, budget=100, shards=4).collect()
    assert {r["shard"] for r in out} == {0, 1, 2, 3}


# -- 6. recombine defaults mirror the reference ------------------------------


def test_recombine_defaults_match_reference_config():
    sig = inspect.signature(recombine)
    assert sig.parameters["max_batch_size"].default == 1000


def test_recombine_default_cap_splits_oversized_group(spark):
    rows = [("s", i, "x") for i in range(2500)]
    df = spark.createDataFrame(rows, "src string, idx int, text string")
    out = recombine(
        df,
        source_cols=["src"],
        order_col="idx",
        is_first_entry=F.col("idx") == 0,
    ).collect()
    counts = sorted(r["recombined_count"] for r in out)
    assert counts == [500, 1000, 1000]
