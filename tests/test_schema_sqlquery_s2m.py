"""Unit tests: schema processor composition/downgrade, sqlquery
receiver tracking-column polling + storage resume, signaltometrics
attribute defaults."""
import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.schema import (
    SEMCONV_RENAMES,
    compose_renames,
    schema_translate,
)
from opentelemetry_collector_contrib_spark.operators.signaltometrics import (
    MetricInfo,
    signal_to_metrics,
)
from opentelemetry_collector_contrib_spark.sources.sqlquery import (
    SQLQueryReceiver,
)


def test_compose_renames_chains_versions():
    m = compose_renames("1.7.0", "1.20.0")
    assert m["net.peer.ip"] == "net.sock.peer.addr"
    assert m["db.cassandra.keyspace"] == "db.name"
    assert m["http.user_agent"] == "user_agent.original"
    # resources section picks the resources-only rename
    r = compose_renames("1.7.0", "1.20.0", section="resources")
    assert r["browser.user_agent"] == "user_agent.original"
    assert "http.user_agent" not in r


def test_compose_renames_partial_range():
    # starting after 1.8.0 must not apply the db renames
    m = compose_renames("1.8.0", "1.20.0")
    assert "db.cassandra.keyspace" not in m
    assert m["net.peer.ip"] == "net.sock.peer.addr"


def test_compose_renames_downgrade_inverts():
    down = compose_renames("1.20.0", "1.7.0")
    assert down["net.sock.peer.addr"] == "net.peer.ip"
    assert down["faas.invocation_id"] == "faas.execution"


def test_compose_renames_multi_step_chain():
    # a synthetic two-hop chain a->b (v2), b->c (v3) composes to a->c
    schema = {
        "2.0.0": {"all": {"a": "b"}},
        "3.0.0": {"all": {"b": "c"}},
    }
    assert compose_renames("1.0.0", "3.0.0", schema) == {"a": "c", "b": "c"}
    assert compose_renames("3.0.0", "1.0.0", schema) == {"c": "a", "b": "a"}


def test_schema_translate_roundtrip(spark):
    df = spark.createDataFrame(
        [({"net.peer.ip": "1.2.3.4", "custom": "x"},)],
        "attributes map<string,string>",
    )
    up = schema_translate(df, "1.7.0", "1.20.0")
    row = up.first()["attributes"]
    assert row == {"net.sock.peer.addr": "1.2.3.4", "custom": "x"}
    back = schema_translate(up, "1.20.0", "1.7.0").first()["attributes"]
    assert back == {"net.peer.ip": "1.2.3.4", "custom": "x"}


def test_sqlquery_incremental_polls(spark, tmp_path):
    spark.createDataFrame(
        [(i, f"body{i}") for i in range(10)], "log_id int, log_body string"
    ).createOrReplaceTempView("my_logs")
    store = str(tmp_path / "tracking.json")
    rx = SQLQueryReceiver(
        sql="SELECT * FROM my_logs WHERE log_id > $1 ",
        tracking_column="log_id",
        tracking_start_value="4",
        body_column="log_body",
        storage_path=store,
    )
    first = rx.poll(spark)
    assert first.count() == 5  # ids 5..9
    assert rx.tracking_value == "9"
    assert rx.poll(spark).count() == 0  # nothing new
    # restart resumes from storage, not tracking_start_value
    # (logs_receiver.go retrieveTrackingValue:261-276)
    rx2 = SQLQueryReceiver(
        sql="SELECT * FROM my_logs WHERE log_id > $1 ",
        tracking_column="log_id",
        tracking_start_value="4",
        body_column="log_body",
        storage_path=store,
    )
    assert rx2.tracking_value == "9"
    assert json.load(open(store))["tracking_value"] == "9"


def test_sqlquery_to_logs_shape(spark):
    spark.createDataFrame(
        [(1, "oops", "svc-a")], "id int, msg string, svc string"
    ).createOrReplaceTempView("t_logs")
    rx = SQLQueryReceiver(
        sql="SELECT * FROM t_logs",
        body_column="msg",
        attribute_columns=("svc",),
    )
    row = rx.to_logs(rx.poll(spark)).first()
    assert row["body"] == "oops" and row["attributes"] == {"svc": "svc-a"}


def test_signaltometrics_default_and_required_attrs(spark):
    df = spark.createDataFrame(
        [
            ("b1", {"k": "a", "v": "1"}),
            ("b2", {"v": "2"}),  # missing k
        ],
        "body string, attributes map<string,string>",
    ).withColumn("time", F.lit("2024-01-01").cast("timestamp"))
    # no default -> row without k is dropped (README attributes rule)
    strict = signal_to_metrics(
        df,
        MetricInfo(
            name="m", metric_type="sum", value='Double(attributes["v"])',
            attributes=(("k",),),
        ),
    ).collect()
    assert {(r["k"], r["m"]) for r in strict} == {("a", 1.0)}
    # with default -> recorded under the default value
    dflt = signal_to_metrics(
        df,
        MetricInfo(
            name="m", metric_type="sum", value='Double(attributes["v"])',
            attributes=(("k", "unknown"),),
        ),
    ).collect()
    assert {(r["k"], r["m"]) for r in dflt} == {("a", 1.0), ("unknown", 2.0)}


def test_signaltometrics_dotted_attribute_keys(spark):
    df = spark.createDataFrame(
        [("b", {"http.method": "GET", "v": "2"}),
         ("b", {"http.method": "GET", "v": "3"})],
        "body string, attributes map<string,string>",
    ).withColumn("time", F.lit("2024-01-01").cast("timestamp"))
    out = signal_to_metrics(
        df,
        MetricInfo(
            name="m", metric_type="sum", value='Double(attributes["v"])',
            attributes=(("http.method",),),
        ),
    )
    rows = out.collect()
    assert out.columns == ["http.method", "m"]
    assert rows[0]["http.method"] == "GET" and rows[0]["m"] == 5.0
