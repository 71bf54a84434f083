"""logstransform processor semantics: a stanza operator sub-pipeline
running mid-stream (processor/logstransformprocessor) — here simply
operator composition: parse -> severity -> filter -> transform chained
as ordinary functions inside a larger pipeline, proving parse
operators and pipeline processors share one algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.filter import filter_processor
from opentelemetry_collector_contrib_spark.operators.parse import (
    regex_parser,
    severity_parser,
    split_on_error,
)
from opentelemetry_collector_contrib_spark.operators.transform import apply_statement


def test_mid_stream_stanza_subpipeline(spark):
    rows = [
        (1, "INFO all good"),
        (2, "ERROR db down"),
        (3, "WARN slow query"),
        (4, "not a log line at all"),
        (5, "ERROR disk full"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")

    # stage 1 (receiver side): regex parse with on_error routing
    parsed = regex_parser(
        df, r"^(?<level>[A-Z]+) (?<msg>.*)$", parse_from="body", mark_ok="ok"
    )
    good, dead = split_on_error(parsed, "ok")
    assert dead.count() == 1 and dead.collect()[0]["id"] == 4

    # stage 2 (mid-stream logstransform): severity -> filter -> OTTL set
    sev = severity_parser(good, "level")
    kept = filter_processor(sev, [F.col("severity_number") < 13])  # drop < WARN
    tagged = apply_statement(
        kept, "alert_tag", F.lit("page-oncall"), where=F.col("severity_number") >= 17
    )

    out = {r["id"]: (r["severity_text"], r["alert_tag"]) for r in tagged.collect()}
    assert set(out) == {2, 3, 5}
    assert out[2] == ("ERROR", "page-oncall")
    assert out[3] == ("WARN", None)
    assert out[5] == ("ERROR", "page-oncall")
