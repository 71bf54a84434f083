"""Windows Event Log translation pinned against the reference fixtures.

- the Security-channel message grammar is pinned against ALL 21 golden
  cases in ``pkg/stanza/operator/input/windows/testdata/security/``
  (message.in -> message.out + details.out), the same corpus
  ``security_test.go`` runs;
- the XML translation is pinned against ``xmlSample.xml`` and
  ``xmlWithAnonymousEventDataEntries.xml`` with the expectations from
  ``xml_test.go:428-505``.
"""
from __future__ import annotations

import json
import os

import pytest

from opentelemetry_collector_contrib_spark.operators.windows_events import (
    parse_security_message,
    windows_event_parse,
)

REF = "/root/reference/pkg/stanza/operator/input/windows/testdata"


def _security_cases():
    base = os.path.join(REF, "security")
    if not os.path.isdir(base):
        return []
    return sorted(os.listdir(base))


@pytest.mark.parametrize("case", _security_cases())
def test_parse_security_golden(case):
    d = os.path.join(REF, "security", case)
    msg = open(os.path.join(d, "message.in")).read()
    subject, details = parse_security_message(msg)
    assert subject == open(os.path.join(d, "message.out")).read()
    assert details == json.load(open(os.path.join(d, "details.out")))


def test_parse_security_bailouts():
    # pair or empty first line -> message passes through untouched
    assert parse_security_message("K:\tV") == ("K:\tV", {})
    assert parse_security_message("") == ("", {})
    # key first line -> key becomes the subject
    subj, det = parse_security_message("Header:")
    assert subj == "Header" and det == {}


@pytest.fixture(scope="module")
def spark():
    from opentelemetry_collector_contrib_spark.session import get_spark

    return get_spark()


def test_xml_sample(spark):
    xml = open(os.path.join(REF, "xmlSample.xml")).read()
    row = windows_event_parse(
        spark.createDataFrame([(xml,)], ["body"])
    ).collect()[0]
    assert row.we_event_id == 16384
    assert row.we_qualifiers == 16384
    assert row.we_provider_name == "Microsoft-Windows-Security-SPP"
    assert row.we_provider_guid == "{E23B33B0-C8C9-472C-A5F9-F2BDFEA0F156}"
    assert row.we_event_source == "Software Protection Platform Service"
    assert row.we_computer == "computer"
    assert row.we_channel == "Application"
    assert row.we_record_id == 23401
    assert row.we_system_time == "2022-04-22T10:20:52.3778625Z"
    # RFC3339Nano with 7 fractional digits -> full ns precision kept
    assert row.we_ts_ns == 1650622852377862500
    assert row.we_ts_valid is True
    assert row.we_severity == "INFO" and row.we_level == "4"
    assert row.we_task == "0" and row.we_opcode == "0"
    assert row.we_keywords == "0x80000000000000"
    assert row.we_message == ""
    assert row.we_details is None
    assert row.we_security_user_id is None
    assert row.we_exec_pid == 0 and row.we_exec_tid == 0
    assert json.loads(row.we_event_data) == [
        {"Time": "2022-04-28T19:48:52Z"}, {"Source": "RulesEngine"},
    ]
    assert row.we_ok is True


def test_xml_anonymous_event_data(spark):
    xml = open(
        os.path.join(REF, "xmlWithAnonymousEventDataEntries.xml")
    ).read()
    row = windows_event_parse(
        spark.createDataFrame([(xml,)], ["body"])
    ).collect()[0]
    assert row.we_event_id == 8194 and row.we_qualifiers == 0
    assert row.we_provider_name == "VSS"
    assert row.we_severity == "ERROR"  # raw level "2"
    assert json.loads(row.we_event_data) == [
        {"": "1st_value"}, {"": "2nd_value"},
    ]
    assert row.we_event_data_binary == "2D20"


def test_malformed_xml_dead_letters(spark):
    rows = windows_event_parse(
        spark.createDataFrame([("<not xml",), ("junk",)], ["body"])
    ).collect()
    assert all(r.we_ok is False for r in rows)
    assert all(r.we_ts_valid is False for r in rows)
    assert all(r.we_severity == "DEFAULT" for r in rows)


def test_security_channel_end_to_end(spark):
    msg = open(os.path.join(REF, "security", "logon", "message.in")).read()
    esc = (
        msg.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    xml = (
        '<Event><System><EventID>4624</EventID>'
        "<Channel>Security</Channel><Level>1</Level>"
        '<TimeCreated SystemTime="2022-04-22T10:20:52Z"/></System>'
        "<RenderingInfo><Message>" + esc + "</Message></RenderingInfo>"
        "</Event>"
    )
    row = windows_event_parse(
        spark.createDataFrame([(xml,)], ["body"])
    ).collect()[0]
    exp_subject = open(
        os.path.join(REF, "security", "logon", "message.out")
    ).read()
    exp_details = json.load(
        open(os.path.join(REF, "security", "logon", "details.out"))
    )
    assert row.we_message == exp_subject
    assert json.loads(row.we_details) == exp_details
    assert row.we_severity == "FATAL"  # raw "1", no rendered level
