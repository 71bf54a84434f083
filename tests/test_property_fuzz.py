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


def test_statement_execution_fuzz(spark):
    """Grammar-directed EXECUTION fuzz: generated statements (chained,
    so editors see each other's effects) must run end-to-end — any
    type mismatch or nil path is a statement-level no-op, never a
    Spark runtime crash (the NULL_MAP_KEY / ANSI-cast class)."""
    import random

    from datetime import datetime

    from opentelemetry_collector_contrib_spark.functions.ottl_compiler import (
        compile_statement,
    )

    random.seed(7)
    df = spark.createDataFrame(
        [(
            "operationA", 1, "TRACE",
            {"flags": "A|B|C", "k": "v", "n": "5"},
            {"host.name": "l"}, "scope", "t", "s",
            datetime(2020, 2, 11, 20, 26, 12), {},
        )],
        "body string, severity_number int, severity_text string, "
        "attributes map<string,string>, resource map<string,string>, "
        "scope string, trace_id string, span_id string, time timestamp, "
        "cache map<string,string>",
    )
    paths = ['body', 'attributes["k"]', 'attributes["missing"]',
             'attributes[attributes["flags"]]', 'attributes["foo"]["bar"]',
             'cache["c"]', 'severity_number', 'time']
    vals = ['"x"', 'nil', '1', '2.5', 'true', 'body',
            'attributes["missing"]', 'Len(attributes)', '[1,2]',
            'SHA256(body)', 'Now()', 'Split(attributes["flags"], "|")']
    conds = ['', ' where attributes["missing"] != nil',
             ' where severity_number / 0 == 1', ' where Len(attributes) > 1']
    editors = ['set({p}, {v})', 'append({p}, {v})',
               'replace_pattern({p}, "a", "b")',
               'replace_match({p}, "*", {v})', 'flatten(attributes)',
               'keep_keys(attributes, ["k"])', 'truncate_all(attributes, 2)']
    # chained in chunks of 10 — deep single chains make Catalyst
    # analysis cost explode (map edits nest expressions); 10 per plan
    # keeps the crash-surface coverage with bounded compile time
    ran = 0
    for chunk in range(6):
        out = df
        applied = 0
        while applied < 10:
            stmt = random.choice(editors).format(
                p=random.choice(paths), v=random.choice(vals)
            ) + random.choice(conds)
            try:
                fn = compile_statement(stmt)
            except OTTLSyntaxError:
                continue
            out = fn(out)
            applied += 1
        out.collect()  # must not raise
        ran += applied
    assert ran == 60
