"""journald input semantics (pkg/stanza/operator/input/journald)."""
from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.receivers import (
    journald_parse,
)


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_journald_parse(spark):
    rows = [
        (1, '{"__CURSOR":"s=1","__REALTIME_TIMESTAMP":"1650000000000001",'
            '"_PID":"42","MESSAGE":"hello","PRIORITY":"6"}'),
        (2, '{"__CURSOR":"s=2","__REALTIME_TIMESTAMP":"1650000000000002",'
            '"MESSAGE":[104,105,33]}'),
        (3, '{"__CURSOR":"s=3","MESSAGE":"no ts"}'),
        (4, '{"__CURSOR":"s=4","__REALTIME_TIMESTAMP":165}'),
        (5, "not json"),
        (6, '{"__REALTIME_TIMESTAMP":"1650000000000003","MESSAGE":"x"}'),
    ]
    out = {
        r.id: r for r in journald_parse(
            spark.createDataFrame(rows, ["id", "body"]),
            convert_message_bytes=True,
        ).collect()
    }
    # µs -> ns (input.go:263), timestamp key deleted, cursor kept
    assert out[1].jd_ts_ns == 1650000000000001000
    assert out[1].jd_body == (
        '{"MESSAGE":"hello","PRIORITY":"6","_PID":"42","__CURSOR":"s=1"}'
    )
    # MESSAGE byte array -> string (input.go:233-243)
    assert out[2].jd_body == '{"MESSAGE":"hi!","__CURSOR":"s=2"}'
    # missing ts / non-string ts / bad JSON / missing cursor all skip
    for bad in (3, 4, 5, 6):
        assert out[bad].jd_ok is False and out[bad].jd_body is None


def test_journald_no_byte_conversion(spark):
    df = spark.createDataFrame(
        [(1, '{"__CURSOR":"c","__REALTIME_TIMESTAMP":"7",'
             '"MESSAGE":[104,105]}')],
        ["id", "body"],
    )
    row = journald_parse(df, convert_message_bytes=False).collect()[0]
    # knob off: the array stays an array in the body JSON
    assert row.jd_body == '{"MESSAGE":[104,105],"__CURSOR":"c"}'
