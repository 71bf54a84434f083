"""Round-5: the sumologic processor's remaining sub-processors —
translate_telegraf_metrics, translate_docker_metrics, nest_attributes.

The nesting cases port the reference's unit-test table
(processor/sumologicprocessor/nesting_processor_test.go:14-246) with
string values (this engine's attribute model is map<string,string>;
the Go table's bool/nested-map inputs carry the same key semantics).
"""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.vendor_semantics import (
    SUMO_DOCKER_METRIC_TRANSLATIONS,
    SUMO_TELEGRAF_METRIC_TRANSLATIONS,
    sumologic_nest_attributes,
    sumologic_translate_docker_metric,
    sumologic_translate_docker_resource_attrs,
    sumologic_translate_telegraf_metric,
)


def _nest_one(spark, entries, **kw):
    """Run the nest UDF on one attribute map built from ordered pairs."""
    pairs = []
    for k, v in entries:
        pairs.extend([F.lit(k), F.lit(v)])
    df = spark.range(1).select(
        sumologic_nest_attributes(F.create_map(*pairs), **kw).alias("j")
    )
    return json.loads(df.collect()[0]["j"])


def test_nest_sample(spark):
    # nesting_processor_test.go:22-43 "sample nesting"
    got = _nest_one(
        spark,
        [
            ("kubernetes.container_name", "xyz"),
            ("kubernetes.host.name", "the host"),
            ("kubernetes.host.address", "127.0.0.1"),
            ("kubernetes.namespace_name", "sumologic"),
            ("another_attr", "42"),
        ],
    )
    assert got == {
        "kubernetes": {
            "container_name": "xyz",
            "host": {"name": "the host", "address": "127.0.0.1"},
            "namespace_name": "sumologic",
        },
        "another_attr": "42",
    }


def test_nest_scalar_vs_map_collision(spark):
    # :77-90 "overwrite map with simple value" — scalar lands under ""
    got = _nest_one(spark, [("sumo.logic", "true"), ("sumo", "false")])
    assert got == {"sumo": {"logic": "true", "": "false"}}
    # reverse entry order reaches the same shape via the
    # former-scalar-moves-under-"" branch (:146-152)
    got2 = _nest_one(spark, [("sumo", "false"), ("sumo.logic", "true")])
    assert got2 == {"sumo": {"": "false", "logic": "true"}}


def test_nest_allowlist(spark):
    # :92-113 "allowlist"
    got = _nest_one(
        spark,
        [
            ("kubernetes.container_name", "xyz"),
            ("kubernetes.host.name", "the host"),
            ("kubernetes.host.address", "127.0.0.1"),
            ("kubernetes.namespace_name", "sumologic"),
            ("another_attr", "42"),
        ],
        include=("kubernetes.container", "kubernetes.host.name"),
    )
    assert got == {
        "kubernetes": {
            "container_name": "xyz",
            "host": {"name": "the host"},
        },
        "kubernetes.host.address": "127.0.0.1",
        "kubernetes.namespace_name": "sumologic",
        "another_attr": "42",
    }


def test_nest_denylist(spark):
    # :115-134 "denylist"
    got = _nest_one(
        spark,
        [
            ("kubernetes.container_name", "xyz"),
            ("kubernetes.host.name", "the host"),
            ("kubernetes.host.address", "127.0.0.1"),
            ("kubernetes.namespace_name", "sumologic"),
            ("another_attr", "42"),
        ],
        exclude=("kubernetes.container", "kubernetes.host"),
    )
    assert got == {
        "kubernetes.container_name": "xyz",
        "kubernetes.host.name": "the host",
        "kubernetes.host.address": "127.0.0.1",
        "kubernetes": {"namespace_name": "sumologic"},
        "another_attr": "42",
    }


def test_nest_allow_and_deny(spark):
    # :136-161 "denylist and allowlist"
    got = _nest_one(
        spark,
        [
            ("kubernetes.container_name", "xyz"),
            ("kubernetes.host.name", "the host"),
            ("kubernetes.host.naming_convention", "random"),
            ("kubernetes.host.address", "127.0.0.1"),
            ("kubernetes.namespace_name", "sumologic"),
            ("another_attr", "42"),
            ("and_end", "fin"),
        ],
        include=("kubernetes.host.",),
        exclude=("kubernetes.host.naming",),
    )
    assert got == {
        "kubernetes.container_name": "xyz",
        "kubernetes": {
            "host": {"name": "the host", "address": "127.0.0.1"},
        },
        "kubernetes.host.naming_convention": "random",
        "kubernetes.namespace_name": "sumologic",
        "another_attr": "42",
        "and_end": "fin",
    }


def test_nest_squash(spark):
    # :188-203 "squash from example" (flat-key input producing the
    # same nested intermediate) + :205-233 "many-value maps"
    got = _nest_one(
        spark,
        [("k8s.pods.a", "A"), ("k8s.pods.b", "B")],
        squash_single_values=True,
    )
    assert got == {"k8s.pods": {"a": "A", "b": "B"}}

    got2 = _nest_one(
        spark,
        [
            ("k8s.pods.a.b.c", "A"),
            ("k8s.pods.b", "B"),
            ("sumo.logic.schema", "processor"),
        ],
        squash_single_values=True,
    )
    assert got2 == {
        "k8s.pods": {"a.b.c": "A", "b": "B"},
        "sumo.logic.schema": "processor",
    }


def test_telegraf_docker_metric_rename(spark):
    rows = spark.createDataFrame(
        [("cpu_usage_active",), ("netstat_tcp_close_wait",), ("whatever",),
         ("container.cpu.percent",), ("container.blockio.sectors_recursive",)],
        "name string",
    ).select(
        sumologic_translate_telegraf_metric(F.col("name")).alias("t"),
        sumologic_translate_docker_metric(F.col("name")).alias("d"),
    ).collect()
    assert [r["t"] for r in rows] == [
        "CPU_Total", "TCP_CloseWait", "whatever",
        "container.cpu.percent", "container.blockio.sectors_recursive",
    ]
    assert [r["d"] for r in rows] == [
        "cpu_usage_active", "netstat_tcp_close_wait", "whatever",
        "cpu_percentage", "sectors_recursive",
    ]


def test_table_sizes_match_reference():
    # translate_telegraf_metrics_processor.go has 41 entries,
    # translate_docker_metrics_processor.go has 49
    assert len(SUMO_TELEGRAF_METRIC_TRANSLATIONS) == 41
    assert len(SUMO_DOCKER_METRIC_TRANSLATIONS) == 49


def test_docker_resource_attr_rename(spark):
    def run(entries):
        pairs = []
        for k, v in entries:
            pairs.extend([F.lit(k), F.lit(v)])
        out = spark.range(1).select(
            F.to_json(
                sumologic_translate_docker_resource_attrs(F.create_map(*pairs))
            ).alias("j")
        )
        return json.loads(out.collect()[0]["j"])

    # plain rename
    assert run([("container.id", "abc"), ("other", "x")]) == {
        "container.FullID": "abc",
        "other": "x",
    }
    # target already present in the ORIGINAL map → keep source key
    # (translate_docker_metrics_processor.go:136-146)
    assert run([("container.id", "abc"), ("container.FullID", "pre")]) == {
        "container.id": "abc",
        "container.FullID": "pre",
    }


def _agg_one(spark, entries, aggregations):
    from opentelemetry_collector_contrib_spark.operators.vendor_semantics import (
        sumologic_aggregate_attributes,
    )

    pairs = []
    for k, v in entries:
        pairs.extend([F.lit(k), F.lit(v)])
    df = spark.range(1).select(F.create_map(*pairs).alias("attrs"))
    out = sumologic_aggregate_attributes(df, aggregations)
    row = out.collect()[0]
    return dict(row["attrs"]), {
        k: dict(v) for k, v in row["aggregated"].items()
    }


def test_aggregate_three_values_one_key(spark):
    # aggregate_attributes_processor_test.go:22-40
    rem, agg = _agg_one(
        spark,
        [("pod_first", "first"), ("pod_second", "second"),
         ("pod_third", "third")],
        [("pods", ["pod_"])],
    )
    assert rem == {}
    assert agg == {"pods": {"first": "first", "second": "second",
                            "third": "third"}}


def test_aggregate_six_values_two_keys(spark):
    # :42-73 (int/bool values carried as strings in this data model)
    rem, agg = _agg_one(
        spark,
        [("pod_first", "first"), ("pod_second", "second"),
         ("pod_third", "third"), ("sono_ichi", "1"), ("sono_ni", "2"),
         ("a totally unrelevant key", "true")],
        [("pods", ["pod_"]), ("counts", ["sono_"])],
    )
    assert rem == {"a totally unrelevant key": "true"}
    assert agg == {
        "pods": {"first": "first", "second": "second", "third": "third"},
        "counts": {"ichi": "1", "ni": "2"},
    }


def test_aggregate_three_prefixes_one_key(spark):
    # :75-100
    rem, agg = _agg_one(
        spark,
        [("A_12", "A12"), ("A_23", "A23"), ("C_2", "C2"), ("B_3", "B3"),
         ("C_88", "C88"), ("B_53", "B53")],
        [("id", ["B_", "A_", "C_"])],
    )
    assert rem == {}
    assert agg == {"id": {"2": "C2", "3": "B3", "12": "A12", "23": "A23",
                          "53": "B53", "88": "C88"}}


def test_aggregate_no_match_adds_nothing(spark):
    # :153-158 — attribute only added when something matched
    rem, agg = _agg_one(
        spark, [("host", "h1")], [("pods", ["pod_"])]
    )
    assert rem == {"host": "h1"}
    assert agg == {}


def test_aggregate_trimmed_key_collision_last_wins(spark):
    # pcommon PutEmpty overwrite: later collected value replaces earlier
    rem, agg = _agg_one(
        spark,
        [("service_name", "svc"), ("container_name", "cn")],
        [("svc", ["service_", "container_"])],
    )
    assert rem == {}
    assert agg == {"svc": {"name": "cn"}}


def test_log_fields_conversion(spark):
    # log_fields_conversion_processor.go:92-114 — insert-if-missing of
    # loglevel/severitytext/spanid/traceid; empty ids render as ''
    from opentelemetry_collector_contrib_spark.operators.vendor_semantics import (
        sumologic_log_fields,
    )

    df = spark.createDataFrame(
        [
            # sev set, ids set
            ({"app": "x"}, 9, "Info", bytes.fromhex("0102030405060708"),
             bytes.fromhex("0102030405060708090a0b0c0d0e0f10")),
            # sev unspecified -> no loglevel; all-zero ids -> ''
            ({"app": "y"}, 0, "t", bytes(8), bytes(16)),
            # preset loglevel + severitytext survive (insert-if-missing)
            ({"loglevel": "preset", "severitytext": "pre"}, 17, "Err",
             bytes.fromhex("ffffffffffffffff"), bytes(16)),
        ],
        "attrs map<string,string>, severity_number int, severity_text string,"
        " span_id binary, trace_id binary",
    )
    rows = [dict(r["attrs"]) for r in sumologic_log_fields(df).collect()]
    assert rows[0] == {
        "app": "x", "loglevel": "INFO", "severitytext": "Info",
        "spanid": "0102030405060708",
        "traceid": "0102030405060708090a0b0c0d0e0f10",
    }
    assert rows[1] == {
        "app": "y", "severitytext": "t", "spanid": "", "traceid": "",
    }
    assert rows[2] == {
        "loglevel": "preset", "severitytext": "pre",
        "spanid": "ffffffffffffffff", "traceid": "",
    }
