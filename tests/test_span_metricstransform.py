"""Unit tests: span processor rules and metricstransform actions."""
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.metricstransform import (
    Operation,
    Transform,
    metrics_transform,
)
from opentelemetry_collector_contrib_spark.operators.span import (
    _template_from_rule,
    span_name_from_attributes,
    span_to_attributes,
)


def _spans(spark, rows):
    return spark.createDataFrame(
        rows, "name string, attributes map<string,string>"
    )


def test_span_rename_requires_all_attributes(spark):
    df = _spans(
        spark,
        [
            ("old", {"db.svc": "django", "operation": "read"}),
            ("old", {"db.svc": "django"}),  # missing operation
        ],
    )
    out = span_name_from_attributes(df, ["db.svc", "operation"], "::")
    assert [r["name"] for r in out.collect()] == ["django::read", "old"]


def test_span_to_attributes_readme_example(spark):
    df = _spans(spark, [("/api/v1/document/12345678/update", {})])
    out = span_to_attributes(
        df, [r"\/api\/v1\/document\/(?P<documentId>.*)\/update"]
    ).first()
    assert out["name"] == "/api/v1/document/{documentId}/update"
    assert out["attributes"] == {"documentId": "12345678"}


def test_span_to_attributes_break_after_match(spark):
    df = _spans(spark, [("/a/x", {}), ("/b/y", {})])
    out = span_to_attributes(
        df,
        [r"\/a\/(?P<p1>.*)", r"\/b\/(?P<p2>.*)"],
        break_after_match=True,
    ).collect()
    assert out[0]["name"] == "/a/{p1}" and out[0]["attributes"] == {"p1": "x"}
    assert out[1]["name"] == "/b/{p2}" and out[1]["attributes"] == {"p2": "y"}


def test_span_template_rejects_nonliteral_tail():
    with pytest.raises(ValueError):
        _template_from_rule(r"prefix.*(?P<g>\d+)")


def test_metricstransform_insert_keeps_original(spark):
    df = spark.createDataFrame(
        [("m.a", {"l": "1"}, 10.0)],
        "metric_name string, labels map<string,string>, value double",
    )
    out = metrics_transform(
        df,
        [
            Transform(
                include="m.a", action="insert", new_name="m.a.scaled",
                operations=(
                    Operation(action="experimental_scale_value", scale=0.5),
                ),
            )
        ],
    ).collect()
    got = {(r["metric_name"], r["value"]) for r in out}
    assert got == {("m.a", 10.0), ("m.a.scaled", 5.0)}


def test_metricstransform_regexp_rename_expands_groups(spark):
    df = spark.createDataFrame(
        [("system.cpu.usage", {}, 1.0)],
        "metric_name string, labels map<string,string>, value double",
    )
    out = metrics_transform(
        df,
        [
            Transform(
                include=r"^system\.cpu\.(.*)$", match_type="regexp",
                action="update", new_name=r"cpu.$1",
            )
        ],
    ).first()
    assert out["metric_name"] == "cpu.usage"


def test_metricstransform_aggregate_label_values(spark):
    df = spark.createDataFrame(
        [
            ("m", {"env": "dev1"}, 1.0),
            ("m", {"env": "dev2"}, 2.0),
            ("m", {"env": "prod"}, 5.0),
        ],
        "metric_name string, labels map<string,string>, value double",
    )
    out = metrics_transform(
        df,
        [
            Transform(
                include="m", action="update",
                operations=(
                    Operation(
                        action="aggregate_label_values", label="env",
                        aggregated_values=("dev1", "dev2"),
                        new_value="dev", aggregation_type="sum",
                    ),
                ),
            )
        ],
    ).collect()
    got = {(r["labels"]["env"], r["value"]) for r in out}
    assert got == {("dev", 3.0), ("prod", 5.0)}


def test_metricstarttime_strategies(spark):
    from opentelemetry_collector_contrib_spark.operators.metricstarttime import (
        metric_start_time,
    )

    df = spark.createDataFrame(
        [
            ("m", "2024-01-01 00:00:00", 10.0, 1),
            ("m", "2024-01-01 00:01:00", 15.0, 2),
            ("m", "2024-01-01 00:02:00", 25.0, 3),
        ],
        "metric_name string, ts string, value double, event_id int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # true reset: first point start==ts, all reuse first ts
    trp = metric_start_time(
        df, ["metric_name"], "true_reset_point", order_cols=["event_id"]
    ).orderBy("event_id").collect()
    assert all(str(r["start_ts"]) == "2024-01-01 00:00:00" for r in trp)
    assert len(trp) == 3
    # subtract initial: first dropped, values rebased
    sip = metric_start_time(
        df, ["metric_name"], "subtract_initial_point", order_cols=["event_id"]
    ).orderBy("event_id").collect()
    assert [(r["event_id"], r["value"]) for r in sip] == [(2, 5.0), (3, 15.0)]
    assert all(str(r["start_ts"]) == "2024-01-01 00:00:00" for r in sip)


def test_metricstarttime_start_time_metric(spark):
    from opentelemetry_collector_contrib_spark.operators.metricstarttime import (
        metric_start_time,
    )

    df = spark.createDataFrame(
        [
            ("job1", "process_start_time", "2024-01-01 00:05:00", 1700000000.0),
            ("job1", "http_requests", "2024-01-01 00:06:00", 42.0),
        ],
        "job string, metric_name string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = metric_start_time(
        df, ["job", "metric_name"], "start_time_metric"
    ).collect()
    assert len(out) == 1
    assert out[0]["metric_name"] == "http_requests"
    assert int(out[0]["start_ts"].timestamp()) == 1700000000
