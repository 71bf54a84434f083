"""Round-5: wavefront receiver line parser — ports the reference's
unit-test table (receiver/wavefrontreceiver/wavefront_parser_test.go
:130-284) plus quoted-tag escape cases from buildLabels
(wavefront_parser.go:144-199).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.receivers import (
    wavefront_parse,
)


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(ln,) for ln in lines], "body string")
    rows = wavefront_parse(df, **kw).collect()
    return [
        (
            r["wf_ok"], r["wf_name"], r["wf_value"], r["wf_value_is_int"],
            r["wf_ts_ns"], r["wf_attrs"],
        )
        for r in rows
    ]


def test_wavefront_go_table(spark):
    got = _parse(
        spark,
        [
            "no.tags 1 1582230020",
            '"/and," 1 1582230020 source=tst',
            "tst.int 1 1582230020 source=tst",
            "tst.dbl 3.14 source=tst k0=v0",          # ts omitted
            "tst.int.3tags 128 1582230020 k0=v_0 k1=v_1 k2=v_2",
            "tst.int.1tag 1.23 1582230020 k0=v_0",
            "incorrect.tags 1.23 1582230000 1582230020",   # err
            "nan.value xyz 1582230000 source=tst",         # err
            " 1.23 1582230000",                            # err: empty name
            "invalid.timestamppb.not.tag 1.23 xyz source=tst",  # err
            "missing.parts 3",                             # err: <3 parts
        ],
        default_ts_ns=7,
    )
    s = 1_582_230_020 * 1_000_000_000
    assert got[0] == (True, "no.tags", 1.0, True, s, "")
    assert got[1] == (True, "/and,", 1.0, True, s, "source=tst")
    assert got[2] == (True, "tst.int", 1.0, True, s, "source=tst")
    assert got[3] == (True, "tst.dbl", 3.14, False, 7, "k0=v0,source=tst")
    assert got[4] == (True, "tst.int.3tags", 128.0, True, s,
                      "k0=v_0,k1=v_1,k2=v_2")
    assert got[5] == (True, "tst.int.1tag", 1.23, False, s, "k0=v_0")
    for i in (6, 7, 8, 9, 10):
        assert got[i][0] is False, got[i]


def test_wavefront_collectd_tags(spark):
    got = _parse(
        spark,
        [
            "collectd.[cdk=cdv].tags 1 source=tst k0=v0",
            "mult.[cdk0=cdv0].collectd.[cdk1=cdv1].groups 1 1582230020 source=tst",
            "collectd.last[cdk0=cdv0] 1 1582230020 source=tst",
            # invalid group (no '=') is left in place, not extracted
            "keep.[plain].name 1 1582230020 source=tst",
        ],
        extract_collectd_tags=True,
        default_ts_ns=7,
    )
    s = 1_582_230_020 * 1_000_000_000
    assert got[0] == (True, "collectd.tags", 1.0, True, 7,
                      "cdk=cdv,k0=v0,source=tst")
    assert got[1] == (True, "mult.collectd.groups", 1.0, True, s,
                      "cdk0=cdv0,cdk1=cdv1,source=tst")
    assert got[2] == (True, "collectd.last", 1.0, True, s,
                      "cdk0=cdv0,source=tst")
    assert got[3] == (True, "keep.[plain].name", 1.0, True, s, "source=tst")


def test_wavefront_quoted_tags(spark):
    got = _parse(
        spark,
        [
            'm 1 1582230020 k="v with spaces" k2=plain',
            'm 1 1582230020 k="esc \\" quote"',
            'm 1 1582230020 k="nl\\nend"',
            'm 1 1582230020 k=""',
            'm 1 1582230020 k="unterminated',      # err: partial quote
            'm 1 1582230020 k="trail\\"',          # err: escaped close only
            'm 1 1582230020 source=s1 k=a k=b',    # last wins
        ],
    )
    s = 1_582_230_020 * 1_000_000_000
    # canon sorts whole tokens: 'k2=plain' < 'k=v…' ('2' < '=')
    assert got[0] == (True, "m", 1.0, True, s, "k2=plain,k=v with spaces")
    assert got[1] == (True, "m", 1.0, True, s, 'k=esc " quote')
    assert got[2] == (True, "m", 1.0, True, s, "k=nl\nend")
    assert got[3] == (True, "m", 1.0, True, s, "k=")
    assert got[4][0] is False
    assert got[5][0] is False
    assert got[6] == (True, "m", 1.0, True, s, "k=b,source=s1")


def test_wavefront_value_and_ts_edges(spark):
    got = _parse(
        spark,
        [
            "m 1e309 1582230020",        # out-of-range float -> err
            "m inf 1582230020",          # explicit inf is legal in Go
            "m -7 -5 k=v",               # negative int value and ts
            'm"x" 1 1582230020',         # quotes not at both ends: kept
        ],
    )
    assert got[0][0] is False
    assert got[1][0] is True and got[1][2] == float("inf")
    assert got[2] == (True, "m", -7.0, True, -5 * 1_000_000_000, "k=v")
    assert got[3][1] == 'm"x"'
