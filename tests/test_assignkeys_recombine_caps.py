"""Round-3 coverage: assign_keys transformer + recombine
max_log_size / force_flush_timeout caps, mirroring
``pkg/stanza/operator/transformer/assignkeys/transformer_test.go`` and
``pkg/stanza/operator/transformer/recombine/transformer_test.go``
(TestMaxLogSizeForLastEntry / TestMaxLogSizeForFirstEntry)."""
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.aggregate import recombine
from opentelemetry_collector_contrib_spark.operators.transform import assign_keys


# -- assign_keys -------------------------------------------------------------

KEYS = ["origin", "sev", "msg", "count", "isBool"]


def test_assign_keys_array_column(spark):
    # transformer_test.go assign_keys_body: list -> map with config keys
    df = spark.createDataFrame(
        [(["body", "INFO", "started agent", "42", "true"],)],
        "input array<string>",
    )
    out = assign_keys(df, "input", KEYS).first()["input_map"]
    assert out == {
        "origin": "body", "sev": "INFO", "msg": "started agent",
        "count": "42", "isBool": "true",
    }


def test_assign_keys_json_cell(spark):
    # the flat model stores nested slices as compact-JSON cells
    df = spark.createDataFrame(
        [('["attribute","INFO","started agent","42","true"]',)],
        "input string",
    )
    out = assign_keys(df, "input", KEYS).first()["input_map"]
    assert out["origin"] == "attribute" and out["count"] == "42"


def test_assign_keys_length_mismatch(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["x", "y", "z"])], "id int, input array<string>"
    )
    # on_error=send: mismatched row passes through UNCHANGED — the
    # original list column survives (ADVICE r3: stanza 'send' keeps the
    # entry's field) and the default out_col is a NEW column
    sent = {r["id"]: r for r in assign_keys(df, "input", ["k1", "k2"]).collect()}
    assert sent[1]["input_map"] == {"k1": "a", "k2": "b"}
    assert sent[2]["input_map"] is None
    assert sent[2]["input"] == ["x", "y", "z"]  # original retained
    # on_error=drop: mismatched row removed (transformer_test.go OnError drop)
    dropped = assign_keys(df, "input", ["k1", "k2"], on_error="drop").collect()
    assert [r["id"] for r in dropped] == [1]


def test_assign_keys_requires_keys(spark):
    df = spark.createDataFrame([(["a"],)], "input array<string>")
    with pytest.raises(ValueError):
        assign_keys(df, "input", [])


# -- recombine max_log_size --------------------------------------------------

def _logs(spark, bodies, path="file1"):
    return spark.createDataFrame(
        [(path, i, b) for i, b in enumerate(bodies)],
        "path string, seq int, body string",
    )


def test_recombine_max_log_size_last_entry(spark):
    # TestMaxLogSizeForLastEntry: cap 5, is_last body=='end'
    df = _logs(spark, ["file1", "file1", "file2", "end"])
    out = recombine(
        df, ["path"], "seq",
        is_last_entry=F.col("body") == "end",
        combine_col="body", max_log_size=5,
    ).orderBy("body").collect()
    assert [r["body"] for r in out] == ["file1\nfile1", "file2\nend"]
    assert [r["recombined_count"] for r in out] == [2, 2]


def test_recombine_max_log_size_first_entry(spark):
    # TestMaxLogSizeForFirstEntry: cap 12, is_first body=='start'
    bodies = ["start", "content1", "content2", "content3", "content4",
              "content5", "start", "start"]
    df = _logs(spark, bodies)
    out = recombine(
        df, ["path"], "seq",
        is_first_entry=F.col("body") == "start",
        combine_col="body", max_log_size=12,
    ).orderBy("seq").collect()
    got = [r["body"] for r in out]
    # batch form flushes the final pending batch too (the reference
    # test leaves the last 'start' buffered in the streaming operator)
    assert got == [
        "start\ncontent1", "content2\ncontent3", "content4\ncontent5",
        "start", "start",
    ]


def test_recombine_max_log_size_keeps_metadata(spark):
    df = spark.createDataFrame(
        [("f", 0, "aaaaaa", "first"), ("f", 1, "bbbbbb", "mid"),
         ("f", 2, "cccccc", "last")],
        "path string, seq int, body string, tag string",
    )
    out = recombine(
        df, ["path"], "seq",
        is_first_entry=F.lit(False) | (F.col("seq") == 0),
        combine_col="body", max_log_size=6, overwrite_with="oldest",
    ).orderBy("seq").collect()
    # first append crosses the 6-byte cap -> flush pairs; 'oldest'
    # keeps the first row's metadata per flushed batch
    assert [(r["body"], r["tag"]) for r in out] == [
        ("aaaaaa\nbbbbbb", "first"), ("cccccc", "last")
    ]
    newest = recombine(
        df, ["path"], "seq",
        is_first_entry=(F.col("seq") == 0),
        combine_col="body", max_log_size=12, overwrite_with="newest",
    ).orderBy("seq").collect()
    assert [(r["body"], r["tag"]) for r in newest] == [
        ("aaaaaa\nbbbbbb", "mid"), ("cccccc", "last")
    ]


def test_recombine_max_batch_size_in_fold(spark):
    # both caps active: batch-size cap triggers before the byte cap
    df = _logs(spark, ["s", "a", "b", "c", "d"])
    out = recombine(
        df, ["path"], "seq",
        is_first_entry=F.col("body") == "s",
        combine_col="body", max_log_size=1000, max_batch_size=2,
    ).orderBy("seq").collect()
    assert [r["body"] for r in out] == ["s\na", "b\nc", "d"]


# -- recombine force_flush_timeout -------------------------------------------

def test_recombine_force_flush_timeout_splits_on_gap(spark):
    df = spark.createDataFrame(
        [
            ("c1", 0, "2024-01-01 00:00:00", "a"),
            ("c1", 1, "2024-01-01 00:00:02", "b"),
            # 10s gap > 5s timeout -> previous batch was idle-flushed
            ("c1", 2, "2024-01-01 00:00:12", "c"),
            ("c1", 3, "2024-01-01 00:00:13", "d"),
        ],
        "conv string, seq int, ts string, body string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = recombine(
        df, ["conv"], "seq",
        is_first_entry=F.col("seq") == 0,
        combine_col="body",
        force_flush_timeout="5 seconds", ts_col="ts",
    ).orderBy("seq").collect()
    assert [r["body"] for r in out] == ["a\nb", "c\nd"]


def test_recombine_max_unmatched_batch_size(spark):
    # TestMaxUnmatchedBatchSizeForFirstEntry (cap 2): leading rows that
    # never matched is_first split every 2; matched batches use the
    # (absent here -> unlimited) max_batch_size
    bodies = ["test2", "test3", "test4", "test5", "test6",
              "test1", "test7", "test8", "test1", "test9", "test10"]
    df = _logs(spark, bodies)
    out = recombine(
        df, ["path"], "seq",
        is_first_entry=F.col("body") == "test1",
        combine_col="body", max_unmatched_batch_size=2,
    ).orderBy("seq").collect()
    assert [r["body"] for r in out] == [
        "test2\ntest3", "test4\ntest5", "test6",
        "test1\ntest7\ntest8", "test1\ntest9\ntest10",
    ]


def test_recombine_max_unmatched_in_size_capped_fold(spark):
    # same cap exercised through the max_log_size fold path
    bodies = ["test2", "test3", "test4", "test1", "test7"]
    df = _logs(spark, bodies)
    out = recombine(
        df, ["path"], "seq",
        is_first_entry=F.col("body") == "test1",
        combine_col="body", max_log_size=10_000,
        max_unmatched_batch_size=2,
    ).orderBy("seq").collect()
    assert [r["body"] for r in out] == [
        "test2\ntest3", "test4", "test1\ntest7",
    ]


def test_recombine_timeout_requires_ts_col(spark):
    df = _logs(spark, ["a"])
    with pytest.raises(ValueError):
        recombine(
            df, ["path"], "seq", is_first_entry=F.lit(True),
            combine_col="body", force_flush_timeout="5 seconds",
        )
