"""Property-based robustness tests (hypothesis).

The reference leans on fuzz/grammar tests for its parsers
(pkg/ottl grammar, ctimefmt, glob); these are the engine's analogs:
every property is a contract the compiler must never break, whatever
the input.
"""
from __future__ import annotations

import fnmatch
import re
import string
from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_spark.functions.grok import compile_grok
from opentelemetry_collector_contrib_spark.functions.ottl import glob_to_regex
from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
    OTTLSyntaxError,
    Parser,
)
from opentelemetry_collector_contrib_spark.functions.strptime import (
    strptime_to_spark,
)
from opentelemetry_collector_contrib_spark.functions.xml_edit import (
    OTTLXPathError,
    _compile_xpath,
)

# ---------------------------------------------------------------------------
# OTTL parser: arbitrary input either parses or raises OTTLSyntaxError —
# never IndexError/KeyError/AttributeError (a crash would take down the
# whole transform stage on one bad config line)
# ---------------------------------------------------------------------------

_ottl_alphabet = (
    string.ascii_letters + string.digits + ' _."[]()+-*/,{}:<>=!&|\''
)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ottl_alphabet, max_size=80))
def test_parser_never_crashes(spark, src):
    try:
        Parser(src).parse_statement()
    except OTTLSyntaxError:
        pass
    # any non-OTTLSyntaxError exception fails the test by escaping


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ottl_alphabet, max_size=60))
def test_condition_parse_never_crashes(spark, src):
    from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
        compile_condition,
    )

    try:
        compile_condition(src)
    except OTTLSyntaxError:
        pass


# ---------------------------------------------------------------------------
# glob_to_regex: parity with fnmatch for the shared subset (*, ?, and
# literal text; fnmatch has no {a,b})
# ---------------------------------------------------------------------------

_glob_alphabet = string.ascii_lowercase + "*?./-"


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=_glob_alphabet, max_size=12),
    st.text(alphabet=string.ascii_lowercase + "./-", max_size=16),
)
def test_glob_matches_fnmatch(pattern, value):
    rx = glob_to_regex(pattern)
    ours = re.fullmatch(rx, value) is not None
    want = fnmatch.fnmatchcase(value, pattern)
    assert ours == want, f"glob {pattern!r} on {value!r}: {ours} != {want}"


# ---------------------------------------------------------------------------
# grok compiler: capture-group count always equals len(fields), so
# regexp_extract indexes can never go out of range; literal text with
# regex metacharacters must not add capture groups
# ---------------------------------------------------------------------------

_grok_literal = st.text(
    alphabet=string.ascii_letters + string.digits + " ()[]{}.-:/\\", max_size=20
)


@settings(max_examples=200, deadline=None)
@given(_grok_literal, st.sampled_from(["IP", "WORD", "NUMBER", "URIPATH"]))
def test_grok_group_count_matches_fields(lit, pat):
    from opentelemetry_collector_contrib_spark.functions.grok import GrokError

    pattern = lit + "%{" + pat + ":f1} %{WORD:f2}"
    try:
        rx, fields = compile_grok(pattern)
    except GrokError:
        return  # malformed literal text must error LOUDLY, not miscount
    groups = re.compile(rx).groups
    assert groups == len(fields), f"{pattern!r}: {groups} != {len(fields)}"


# ---------------------------------------------------------------------------
# strptime translation: every directive in the pinned table translates
# without error, and a datetime round-trips through Go-layout
# formatting for the unambiguous directives
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(
    st.datetimes(
        min_value=datetime(1990, 1, 1), max_value=datetime(2035, 1, 1)
    )
)
def test_strptime_roundtrip_core_layout(dt):
    layout = "%Y-%m-%d %H:%M:%S"
    spark_fmt = strptime_to_spark(layout)
    # the translated pattern is a valid Java/py strftime equivalence
    # for the core directives: format with python, parse shape holds
    s = dt.strftime("%Y-%m-%d %H:%M:%S")
    assert spark_fmt == "yyyy-MM-dd HH:mm:ss"
    assert datetime.strptime(s, layout).replace(tzinfo=None) == dt.replace(
        microsecond=0
    )


# ---------------------------------------------------------------------------
# XPath subset compiler: arbitrary strings either compile or raise
# OTTLXPathError (never ET internals leaking out)
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_letters + "/@[]*'=().{}", max_size=30))
def test_xpath_compile_never_crashes(xp):
    try:
        _compile_xpath(xp)
    except OTTLXPathError:
        pass
