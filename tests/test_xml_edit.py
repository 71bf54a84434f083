"""Write-side XML OTTL functions vs the reference's own test tables.

Cases ported from func_remove_xml_test.go:15-100,
func_insert_xml_test.go:15-115, func_parse_xml_test.go:18-130,
func_convert_attributes_to_elements_xml_test.go and
func_convert_text_to_elements_xml_test.go:15-90.  XPath forms outside
ElementTree's subset (predicates with functions — local-name(),
not(), text()-content matches, comment()) are asserted to raise
OTTLXPathError at compile time rather than silently doing nothing.
"""
import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.xml_edit import (
    ConvertAttributesToElementsXML,
    ConvertTextToElementsXML,
    InsertXML,
    OTTLXPathError,
    ParseXML,
    RemoveXML,
)


def _run(spark, doc, col):
    return spark.createDataFrame([(doc,)], "x string").select(
        col.alias("y")
    ).first()["y"]


REMOVE_CASES = [
    # (document, xpath, want) — func_remove_xml_test.go:22-60
    ("<a><b/></a>", "/a/b", "<a></a>"),
    ("<a><b/><b/></a>", "/a/b", "<a></a>"),
    ("<a><b/><b><c/></b></a>", "/a/b", "<a></a>"),
    ("<a><b/><b/><c><b><d/></b></c></a>", "/a//b", "<a><c></c></a>"),
    ('<a foo="bar"/>', "/a/@foo", "<a></a>"),
    (
        '<a><b foo="bar"/><b foo="notbar"/></a>',
        "/a/b[@foo='bar']",
        '<a><b foo="notbar"></b></a>',
    ),
    (
        '<a><b foo="bar"/><c foo="bar"/></a>',
        "//@foo",
        "<a><b></b><c></c></a>",
    ),
    ("<a>delete this</a>", "/a/text()", "<a></a>"),
    (
        '<?xml version="1.0" encoding="UTF-8"?><a>delete this</a>',
        "/a/text()",
        '<?xml version="1.0" encoding="UTF-8"?><a></a>',
    ),
    ("", "/", ""),
]


@pytest.mark.parametrize("doc,xpath,want", REMOVE_CASES)
def test_remove_xml(spark, doc, xpath, want):
    assert _run(spark, doc, RemoveXML(F.col("x"), xpath)) == want


def test_remove_xml_preserves_sibling_tail(spark):
    got = _run(spark, "<a>keep<b/>tail</a>", RemoveXML(F.col("x"), "/a/b"))
    assert got == "<a>keeptail</a>"


INSERT_CASES = [
    # (document, xpath, subdoc, want) — func_insert_xml_test.go:24-100
    ("<a></a>", "/a", "<b/>", "<a><b></b></a>"),
    ("<a></a><a></a>", "/a", "<b/>", "<a><b></b></a><a><b></b></a>"),
    (
        "<a></a><z><a></a></z>",
        "//a",
        "<b/>",
        "<a><b></b></a><z><a><b></b></a></z>",
    ),
    ("<a></a>", "/", "<b/><c/>", "<a></a><b></b><c></c>"),
    ("<a></a>", "/a", "<b/><c/>", "<a><b></b><c></c></a>"),
    (
        "<a></a><a></a>",
        "/a",
        "<b/><c/>",
        "<a><b></b><c></c></a><a><b></b><c></c></a>",
    ),
    (
        "<a></a>",
        "/a",
        '<x foo="bar"><b>text</b><c><d><e>1</e><e>two</e></d></c></x>',
        '<a><x foo="bar"><b>text</b><c><d><e>1</e><e>two</e></d></c></x></a>',
    ),
    ("", "/", "<a/>", "<a></a>"),
    ("<a></a>", "/", "<a/>", "<a></a><a></a>"),
]


@pytest.mark.parametrize("doc,xpath,sub,want", INSERT_CASES)
def test_insert_xml(spark, doc, xpath, sub, want):
    assert _run(spark, doc, InsertXML(F.col("x"), xpath, sub)) == want


def test_insert_xml_rejects_attribute_xpath():
    with pytest.raises(OTTLXPathError):
        InsertXML(F.lit("<a/>"), "/a/@foo", "<b/>")


def test_unsupported_xpath_raises_at_compile_time():
    for bad in ("//@*[local-name() != 'keep']", "//comment()", "//a[not(b)]"):
        with pytest.raises(OTTLXPathError):
            RemoveXML(F.lit("<a/>"), bad)


def test_parse_xml_nested(spark):
    doc = (
        "<Log><User><ID>00001</ID><Name>Joe</Name>"
        "<Email>joe.smith@example.com</Email></User>"
        "<Text>User did a thing</Text></Log>"
    )
    want = {
        "tag": "Log",
        "children": [
            {
                "tag": "User",
                "children": [
                    {"tag": "ID", "content": "00001"},
                    {"tag": "Name", "content": "Joe"},
                    {"tag": "Email", "content": "joe.smith@example.com"},
                ],
            },
            {"tag": "Text", "content": "User did a thing"},
        ],
    }
    got = json.loads(_run(spark, doc, ParseXML(F.col("x"))))
    assert got == want


def test_parse_xml_formatted_ignores_indentation(spark):
    doc = "\n<Log>\n  <User>\n    <ID>00001</ID>\n  </User>\n</Log>"
    got = json.loads(_run(spark, doc, ParseXML(F.col("x"))))
    assert got == {
        "tag": "Log",
        "children": [
            {"tag": "User", "children": [{"tag": "ID", "content": "00001"}]}
        ],
    }


def test_parse_xml_attribute_collision(spark):
    doc = '<Log>txt<User id="0001"/><User id="0002"/></Log>'
    got = json.loads(_run(spark, doc, ParseXML(F.col("x"))))
    assert got == {
        "tag": "Log",
        "content": "txt",
        "children": [
            {"tag": "User", "attributes": {"id": "0001"}},
            {"tag": "User", "attributes": {"id": "0002"}},
        ],
    }


def test_parse_xml_invalid_returns_null(spark):
    assert _run(spark, "not xml", ParseXML(F.col("x"))) is None


CONVERT_ATTRS_CASES = [
    # func_convert_attributes_to_elements_xml_test.go (code order:
    # converted elements appended last, attribute document order)
    (
        '<a foo="bar" hello="world"><b/></a>',
        None,
        "<a><b></b><foo>bar</foo><hello>world</hello></a>",
    ),
    ('<a foo="bar"><b hello="world"/></a>', "/a/@foo",
     '<a><b hello="world"></b><foo>bar</foo></a>'),
    ("<a><b/></a>", None, "<a><b></b></a>"),
]


@pytest.mark.parametrize("doc,xpath,want", CONVERT_ATTRS_CASES)
def test_convert_attributes_to_elements(spark, doc, xpath, want):
    col = (
        ConvertAttributesToElementsXML(F.col("x"))
        if xpath is None
        else ConvertAttributesToElementsXML(F.col("x"), xpath)
    )
    assert _run(spark, doc, col) == want


CONVERT_TEXT_CASES = [
    # func_convert_text_to_elements_xml_test.go:24-78
    ("<a><b/></a>", None, None, "<a><b></b></a>"),
    (
        '<?xml version="1.0" encoding="UTF-8"?><a><b/></a>',
        None,
        None,
        '<?xml version="1.0" encoding="UTF-8"?><a><b></b></a>',
    ),
    ('<a foo="bar" hello="world"/>', None, None,
     '<a foo="bar" hello="world"></a>'),
    ("<a>hello world</a>", None, None, "<a>hello world</a>"),
    ("<a><b/>foo</a>", None, None, "<a><b></b><value>foo</value></a>"),
    ("<a><b/>foo</a>", None, "bar", "<a><b></b><bar>foo</bar></a>"),
    (
        "<a>foo<b/>bar</a>",
        None,
        None,
        "<a><value>foo</value><b></b><value>bar</value></a>",
    ),
    (
        "<a>foo<b/>bar<c/>1<d>not</d>2<e><f/><f/></e></a>",
        None,
        "v",
        "<a><v>foo</v><b></b><v>bar</v><c></c><v>1</v>"
        "<d>not</d><v>2</v><e><f></f><f></f></e></a>",
    ),
    (
        "<a><b><c/>foo</b><d><c/>bar</d><b><c/>baz</b></a>",
        "/a/b",
        None,
        "<a><b><c></c><value>foo</value></b><d><c></c>bar</d>"
        "<b><c></c><value>baz</value></b></a>",
    ),
]


@pytest.mark.parametrize("doc,xpath,name,want", CONVERT_TEXT_CASES)
def test_convert_text_to_elements(spark, doc, xpath, name, want):
    col = ConvertTextToElementsXML(
        F.col("x"), xpath or "/", name or "value"
    )
    assert _run(spark, doc, col) == want
