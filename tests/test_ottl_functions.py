"""OTTL converter corpus — the e2e statement-corpus analog.

Mirrors the reference's language e2e suite
(``pkg/ottl/e2e/e2e_test.go:38-112``: one canonical log record, 193
statement -> expected-cell cases). Here: one canonical row, each case
is (converter expression, expected value), all evaluated in a single
select so the whole corpus runs as one codegen'd projection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions import ottl as O

# canonical record (the e2e fixture analog)
ROW = {
    "body": "operationA completed",
    "http_method": "get",
    "http_path": "/health",
    "http_url": "https://example.com:8080/foo/bar?q=1",
    "total_duration": "1h2m3s",
    "flags": "A|B|C",
    "version": "1.2.3",
    "num_s": "42",
    "neg_float_s": "-7.9",
    "hexnum": "0xFF",
    "card": "4532015112830366",
    "badcard": "1234567812345678",
    "camel": "anAwesomeValue",
    "snake": "an_awesome_value",
    "spaced": "  padded  ",
    "b64": "aGVsbG8=",
    "kv": "k1=v1 k2=v2",
    "csv_line": "a,b,c",
    "json_body": '{"x": "1", "y": "2"}',
    "ts_str": "2024-02-04 10:20:30",
    "empty": "",
}


@pytest.fixture(scope="module")
def row(spark):
    schema = ", ".join(f"{k} string" for k in ROW)
    return spark.createDataFrame([tuple(ROW.values())], schema)


def run_cases(row, cases):
    exprs = [expr.alias(f"c{i}") for i, (expr, _) in enumerate(cases)]
    got = row.select(*exprs).collect()[0]
    for i, (_, want) in enumerate(cases):
        g = got[f"c{i}"]
        assert g == want, f"case {i}: got {g!r}, want {want!r}"


def test_string_family(row):
    c = F.col
    run_cases(row, [
        (O.Concat([c("http_method"), c("http_path")], "-"), "get-/health"),
        (O.Format("%s=%s", c("http_method"), c("num_s")), "get=42"),
        (O.Split(c("flags"), "|"), ["A", "B", "C"]),
        (O.Substring(c("body"), 0, 9), "operation"),
        (O.Substring(c("body"), 9, 1), "A"),
        (O.Trim(c("spaced")), "padded"),
        (O.ToUpperCase(c("http_method")), "GET"),
        (O.ToLowerCase(F.lit("SQL")), "sql"),
        (O.ToSnakeCase(c("camel")), "an_awesome_value"),
        (O.ToCamelCase(c("snake")), "AnAwesomeValue"),
        (O.HasPrefix(c("body"), "operation"), True),
        (O.HasSuffix(c("body"), "completed"), True),
        (O.HasSuffix(c("body"), "nope"), False),
        (O.Len(c("body")), 20),
        (O.String(F.lit(3).cast("long")), "3"),
    ])


def test_parse_family(row):
    c = F.col
    run_cases(row, [
        (O.IsMatch(c("body"), r"^operation[A-Z]"), True),
        (O.IsMatch(c("body"), r"^nope"), False),
        (
            O.ExtractPatterns(c("http_url"), r"https://(?<host>[^:/]+):(?<port>\d+)"),
            {"host": "example.com", "port": "8080"},
        ),
        (O.ParseJSON(c("json_body")), {"x": "1", "y": "2"}),
        (O.ParseCSV(c("csv_line"), ["f1", "f2", "f3"])["f2"], "b"),
        (O.ParseKeyValue(c("kv")), {"k1": "v1", "k2": "v2"}),
        (O.ParseInt(c("num_s")), 42),
        (O.ParseInt(c("hexnum"), 16), 255),
        (O.URL(c("http_url"))["url.domain"], "example.com"),
        (O.URL(c("http_url"))["url.path"], "/foo/bar"),
        (O.Decode(c("b64"), "base64").cast("string"), "hello"),
    ])


def test_time_family(row):
    c = F.col
    run_cases(row, [
        (O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S").isNotNull(), True),
        (O.FormatTime(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S"), "%Y/%m/%d"), "2024/02/04"),
        (O.Year(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 2024),
        (O.Month(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 2),
        (O.Day(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 4),
        (O.Hour(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 10),
        (O.Minute(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 20),
        (O.Second(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 30),
        # 2024-02-04 is a Sunday -> Go Weekday 0
        (O.Weekday(O.Time(c("ts_str"), "%Y-%m-%d %H:%M:%S")), 0),
        (O.Duration("1h2m3s"), 3_723_000_000_000),
        (O.Duration("100ms"), 100_000_000),
        (O.Seconds(O.Duration("1h2m3s")), 3723.0),
        (O.Hours(O.Duration("90m")), 1.5),
        (O.Milliseconds(O.Duration("1s")), 1000.0),
        (
            O.UnixSeconds(F.to_timestamp(c("ts_str"))),
            1707042030,  # 2024-02-04T10:20:30Z (session tz pinned UTC)
        ),
        (O.UnixMilli(F.to_timestamp(c("ts_str"))), 1707042030000),
        (O.UnixNano(F.to_timestamp(c("ts_str"))), 1707042030000000000),
        (O.Unix(F.lit(1707042030)).cast("string"), "2024-02-04 10:20:30"),
        (O.TruncateTime(F.to_timestamp(c("ts_str")), "hour").cast("string"), "2024-02-04 10:00:00"),
    ])


def test_hash_family(row):
    c = F.col
    run_cases(row, [
        (O.MD5(F.lit("abc")), "900150983cd24fb0d6963f7d28e17f72"),
        (O.SHA1(F.lit("abc")), "a9993e364706816aba3e25717850c26c9cd0d89d"),
        (
            O.SHA256(F.lit("abc")),
            "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
        ),
        (O.Hex(F.lit("Hello").cast("binary")), "48656c6c6f"),
        # FNV-1a 64 of "abc" = 0xe71fa2190541574b as Go int64
        (O.FNV(F.lit("abc")), O_FNV_ABC),
        (O.UUID(F.lit("seed-1")).rlike(r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$"), True),
        (O.TraceID(F.lit("0123456789ABCDEF0123456789abcdef")), "0123456789abcdef0123456789abcdef"),
        (O.SpanID(F.lit("00f067aa0ba902b7")), "00f067aa0ba902b7"),
        (O.SpanID(F.lit("tooshort")), ""),
    ])


# top bit set -> negative as Go int64
O_FNV_ABC = 0xE71FA2190541574B - (1 << 64)  # == -1792535898324117685


def test_math_type_family(row):
    c = F.col
    run_cases(row, [
        (O.Double(c("num_s")), 42.0),
        (O.Int(c("neg_float_s")), -7),          # truncation toward zero
        (O.Int(F.lit("3.9")), 3),
        (O.Log(F.lit(1.0)), 0.0),
        (O.IsInt(c("num_s")), True),
        (O.IsInt(c("body")), False),
        (O.IsDouble(c("neg_float_s")), True),
        (O.IsValidLuhn(c("card")), True),
        (O.IsValidLuhn(c("badcard")), False),
        (O.ottl_div(F.lit(7).cast("long"), F.lit(2).cast("long"), int_math=True), 3),
        (O.ottl_div(F.lit(7.0), F.lit(2.0), int_math=False), 3.5),
        (O.ottl_div(F.lit(7).cast("long"), F.lit(0).cast("long"), int_math=True), None),
    ])


def test_map_list_family(row):
    c = F.col
    kv = O.ParseKeyValue(c("kv"))
    run_cases(row, [
        (F.array_sort(O.Keys(kv)), ["k1", "k2"]),
        (F.array_sort(O.Values(kv)), ["v1", "v2"]),
        (O.Sort(O.Split(c("flags"), "|"), "desc"), ["C", "B", "A"]),
        (O.ContainsValue(O.Split(c("flags"), "|"), "B"), True),
        (O.Append(O.Split(c("flags"), "|"), F.lit("D")), ["A", "B", "C", "D"]),
        (O.ToKeyValueString(kv), "k1=v1 k2=v2"),
    ])


def test_registry_is_complete():
    # every converter family from functions.go has representatives
    assert len(O.OTTL_CONVERTERS) >= 60
    for name in ["Concat", "ExtractPatterns", "Time", "SHA256", "Int", "Keys"]:
        assert name in O.OTTL_CONVERTERS


def test_xml_family(spark):
    xml = '<log level="warn"><msg>disk low</msg><code>88</code><tag>a</tag><tag>b</tag></log>'
    df = spark.createDataFrame([(xml,)], "x string")
    row = df.select(
        O.GetXMLString(F.col("x"), "/log/msg").alias("msg"),
        O.GetXMLInt(F.col("x"), "/log/code").alias("code"),
        O.GetXML(F.col("x"), "/log/tag/text()").alias("tags"),
        O.GetXMLString(F.col("x"), "/log/@level").alias("level"),
        O.ParseSimplifiedXML(
            F.col("x"), {"message": "/log/msg", "missing": "/log/nope"}
        ).alias("m"),
    ).collect()[0]
    assert row["msg"] == "disk low"
    assert row["code"] == 88
    assert row["tags"] == ["a", "b"]
    assert row["level"] == "warn"
    assert row["m"] == {"message": "disk low"}  # empty matches dropped
