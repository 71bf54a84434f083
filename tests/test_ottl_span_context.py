"""OTTL span/metric/datapoint context statements through the compiler,
against the flat span model (pkg/ottl/contexts/internal/ctxspan/span.go
path registry + symbols.go enums; ctxmetric/metric.go;
ctxdatapoint/datapoint.go)."""
import pytest

from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
    OTTLSyntaxError,
    compile_statements,
    infer_context,
)


@pytest.fixture(scope="module")
def span(spark):
    df = spark.createDataFrame(
        [
            (
                "GET /health", 2, 0, "",
                {"http.method": "get", "http.path": "/health"},
                "0102030405060708090a0b0c0d0e0f10", "0102030405060708",
                "0807060504030201", "congo=t61rcWkgMzE",
            )
        ],
        "name string, kind long, status_code long, status_message string, "
        "attributes map<string,string>, trace_id string, span_id string, "
        "parent_span_id string, trace_state string",
    )
    return df


def run(stmts, df):
    if isinstance(stmts, str):
        stmts = [stmts]
    return compile_statements(stmts)(df).collect()[0].asDict(recursive=True)


SPAN_CASES = [
    ('set(span.name, "replaced")', lambda r: r["name"] == "replaced"),
    ('set(span.name, span.attributes["http.method"])',
     lambda r: r["name"] == "get"),
    ('set(span.attributes["k"], span.name)',
     lambda r: r["attributes"]["k"] == "GET /health"),
    ('set(span.status.code, STATUS_CODE_ERROR)',
     lambda r: r["status_code"] == 2),
    ('set(span.status.message, "boom") where span.status.code == STATUS_CODE_UNSET',
     lambda r: r["status_message"] == "boom"),
    ('set(span.status.message, "boom") where span.status.code == STATUS_CODE_ERROR',
     lambda r: r["status_message"] == ""),
    ('set(span.attributes["kind"], span.kind.string)',
     lambda r: r["attributes"]["kind"] == "Server"),
    ('set(span.attributes["kind"], span.kind.deprecated_string)',
     lambda r: r["attributes"]["kind"] == "SPAN_KIND_SERVER"),
    ('set(span.kind, SPAN_KIND_CLIENT)', lambda r: r["kind"] == 3),
    ('set(span.attributes["tid"], span.trace_id.string)',
     lambda r: r["attributes"]["tid"]
     == "0102030405060708090a0b0c0d0e0f10"),
    ('set(span.attributes["sid"], span.span_id.string)',
     lambda r: r["attributes"]["sid"] == "0102030405060708"),
    ('set(span.name, span.parent_span_id) where span.kind == SPAN_KIND_SERVER',
     lambda r: r["name"] == "0807060504030201"),
    ('delete_key(span.attributes, "http.path")',
     lambda r: "http.path" not in r["attributes"]),
    ('keep_keys(span.attributes, ["http.method"])',
     lambda r: list(r["attributes"]) == ["http.method"]),
    ('replace_pattern(span.attributes["http.path"], "/", "@")',
     lambda r: r["attributes"]["http.path"] == "@health"),
]


@pytest.mark.parametrize("stmt,check", SPAN_CASES)
def test_span_context_cases(spark, span, stmt, check):
    assert check(run(stmt, span)), stmt


def test_span_context_inferred():
    stmts = ['set(span.attributes["x"], "1")', 'set(attributes["y"], "2")']
    assert infer_context(stmts) == "span"


def test_unknown_span_field_rejected(span):
    with pytest.raises(OTTLSyntaxError):
        compile_statements(["set(span.nonexistent, 1)"])
    with pytest.raises(OTTLSyntaxError):
        compile_statements(['set(span.status.weird, 1)'])
    with pytest.raises(OTTLSyntaxError):
        compile_statements(['set(span.kind.bogus, 1)'])


@pytest.fixture(scope="module")
def datapoint(spark):
    return spark.createDataFrame(
        [("req.count", "By", "", 12.0, {"env": "prod"})],
        "metric_name string, unit string, description string, "
        "value double, attributes map<string,string>",
    )


METRIC_CASES = [
    ('set(metric.name, "renamed")', lambda r: r["metric_name"] == "renamed"),
    ('set(metric.unit, "ms") where metric.name == "req.count"',
     lambda r: r["unit"] == "ms"),
    ('set(metric.description, metric.name)',
     lambda r: r["description"] == "req.count"),
    ('set(datapoint.attributes["v"], datapoint.value_double)',
     lambda r: r["attributes"]["v"] == "12.0"),
    ('set(datapoint.value_double, 99.5)', lambda r: r["value"] == 99.5),
]


@pytest.mark.parametrize("stmt,check", METRIC_CASES)
def test_metric_datapoint_context_cases(spark, datapoint, stmt, check):
    assert check(run(stmt, datapoint)), stmt


def test_metric_context_inferred():
    assert infer_context(['set(metric.name, "x")']) == "metric"
    assert infer_context(
        ['set(datapoint.attributes["a"], 1)', 'set(metric.name, "x")']
    ) == "datapoint"


@pytest.fixture(scope="module")
def spanevent(spark):
    return spark.createDataFrame(
        [("exception", {"exception.type": "IOError"})],
        "event_name string, attributes map<string,string>",
    )


SPANEVENT_CASES = [
    ('set(spanevent.name, "renamed")',
     lambda r: r["event_name"] == "renamed"),
    ('set(spanevent.attributes["t"], spanevent.name)',
     lambda r: r["attributes"]["t"] == "exception"),
    ('delete_key(spanevent.attributes, "exception.type") where spanevent.name == "exception"',
     lambda r: r["attributes"] == {}),
]


@pytest.mark.parametrize("stmt,check", SPANEVENT_CASES)
def test_spanevent_context_cases(spark, spanevent, stmt, check):
    assert check(run(stmt, spanevent)), stmt


def test_spanevent_context_inferred():
    assert infer_context(
        ['set(spanevent.attributes["a"], 1)', 'set(span.name, "x")']
    ) == "spanevent"
