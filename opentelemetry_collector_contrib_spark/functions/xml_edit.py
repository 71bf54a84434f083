"""Write-side OTTL XML functions: ParseXML, InsertXML, RemoveXML,
ConvertAttributesToElementsXML, ConvertTextToElementsXML.

The reference implements these over antchfx/xmlquery (full XPath 1.0):
``pkg/ottl/ottlfuncs/func_parse_xml.go`` (recursive element->map),
``func_insert_xml.go:42-86`` (append sub-document under selected
elements), ``func_remove_xml.go:43-95`` (remove elements / attributes /
text), ``func_convert_attributes_to_elements_xml.go:44-69`` and
``func_convert_text_to_elements_xml.go:48-107``.

Spark's built-in ``xpath_*`` expressions are read-only, so the write
side runs as Arrow-batched pandas UDFs over ``xml.etree.ElementTree``
— one Python invocation per Arrow batch, no per-row JVM<->Python
round-trips.  XPath coverage is ElementTree's documented subset
(``tag``, ``*``, ``//``, ``.``, ``[@attr]``, ``[@attr='v']``,
``[tag]``, ``[pos]``) plus the attribute (``…/@name``, ``//@*``) and
``…/text()`` selector forms the reference test-suite uses; anything
else raises ``OTTLXPathError`` at compile time — loudly, not silently
at run time.

Serialization parity: xmlquery's ``OutputXML`` renders empty elements
as ``<b></b>`` (see ``func_convert_text_to_elements_xml_test.go:25-27``)
— matched here with ``short_empty_elements=False``.  A leading
``<?xml …?>`` declaration is preserved verbatim.  Rows whose target is
not well-formed XML yield NULL (the compiler's ignore-mode contract,
same as ``from_json`` on bad JSON).
"""
from __future__ import annotations

import copy
import json
import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


class OTTLXPathError(ValueError):
    """Unsupported or invalid XPath for the ElementTree subset."""


_DECL_RE = re.compile(r"^\s*<\?xml[^?]*\?>")
_ATTR_TAIL_RE = re.compile(r"/@([A-Za-z_*][\w.\-]*)$")

_WRAP = "__ottl_xml_doc__"


def _split_decl(s: str) -> tuple[str, str]:
    m = _DECL_RE.match(s)
    if m:
        return s[: m.end()], s[m.end():]
    return "", s


def _parse_wrapped(s: str) -> ET.Element:
    """Parse a document (or multi-root fragment) under a synthetic
    wrapper element so absolute XPaths and document-node selection
    both have a stable anchor (mirrors xmlquery's DocumentNode)."""
    return ET.fromstring(f"<{_WRAP}>{s}</{_WRAP}>")


def _serialize(wrap: ET.Element) -> str:
    parts = [wrap.text or ""]
    for child in wrap:
        parts.append(
            ET.tostring(child, encoding="unicode", short_empty_elements=False)
        )
    return "".join(parts)


def _compile_xpath(xpath: str) -> tuple[str, str, str | None]:
    """Split an XPath into (element-selector in ET syntax, node kind,
    attribute name).  kind is 'element' | 'attr' | 'text' | 'doc'."""
    kind, attr = "element", None
    if xpath.endswith("/text()"):
        kind, xpath = "text", xpath[: -len("/text()")]
    else:
        m = _ATTR_TAIL_RE.search(xpath)
        if m:
            kind, attr = "attr", m.group(1)
            if xpath.startswith("//") and m.start() == 1:
                # `//@x` — the owning element can be any element
                xpath = ".//*"
            else:
                xpath = xpath[: m.start()]
    if xpath in ("", "/"):
        if kind == "element":
            return ".", "doc", None
        return ".", kind, attr
    if xpath == ".//*":
        return xpath, kind, attr
    if xpath.startswith("//"):
        sel = "." + xpath
    elif xpath.startswith("/"):
        sel = "." + xpath  # absolute: relative to the synthetic wrapper
    else:
        sel = xpath
    # validate eagerly on an empty wrapper — ET raises SyntaxError on
    # malformed paths; surface it at statement-compile time
    try:
        ET.Element(_WRAP).findall(sel)
    except Exception as exc:
        # ElementPath raises SyntaxError for malformed paths, KeyError
        # for unknown operators, TypeError for degenerate tokens ('[')
        # — every parse failure must surface as OTTLXPathError
        raise OTTLXPathError(
            f"XPath {xpath!r} is outside the supported ElementTree "
            f"subset: {exc!r}"
        ) from None
    return sel, kind, attr


def _local(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


# ---------------------------------------------------------------------------
# ParseXML — element tree -> the reference's pcommon.Map shape
# (func_parse_xml.go: keys tag / content / attributes / children),
# JSON-encoded because the map is recursive and Spark column types are
# closed; compose with ParseJSON / get_json_object to read fields.
# ---------------------------------------------------------------------------

def _elem_to_map(e: ET.Element) -> dict:
    out: dict = {"tag": _local(e.tag)}
    pieces = [(e.text or "").strip()]
    for ch in e:
        pieces.append((ch.tail or "").strip())
    content = "".join(pieces)
    if content:
        out["content"] = content
    if e.attrib:
        out["attributes"] = {_local(k): v for k, v in e.attrib.items()}
    children = [_elem_to_map(ch) for ch in e]
    if children:
        out["children"] = children
    return out


def ParseXML(c: Column) -> Column:
    @pandas_udf("string")
    def _parse(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                root = ET.fromstring(_split_decl(v)[1])
            except ET.ParseError:
                return None
            return json.dumps(_elem_to_map(root), separators=(",", ":"))
        return s.map(one)

    return _parse(c.cast("string"))


def _simplify_element(e: ET.Element) -> dict:
    """func_parse_simplified_xml.go parseElement: leaf elements become
    key->text, repeated tags become slices, nested become maps."""
    counts: dict[str, int] = {}
    for ch in e:
        counts[_local(ch.tag)] = counts.get(_local(ch.tag), 0) + 1
    out: dict = {}
    for ch in e:
        tag = _local(ch.tag)
        has_children = len(ch) > 0
        # leafValueFromElement: ignore text when child elements exist
        leaf = "" if has_children else (ch.text or "")
        if not has_children and not leaf and not list(ch):
            # empty element: reference skips FirstChild == nil
            continue
        if counts[tag] > 1:
            bucket = out.setdefault(tag, [])
            if leaf != "":
                bucket.append(leaf)
                continue
            sub = _simplify_element(ch)
            if sub:
                bucket.append(sub)
            continue
        if leaf != "":
            out[tag] = leaf
            continue
        sub = _simplify_element(ch)
        if sub:
            out[tag] = sub
    # drop empty slice buckets the reference never creates
    return {k: v for k, v in out.items() if v != []}


def parse_simplified_xml_udf(c: Column) -> Column:
    @pandas_udf("string")
    def _simplify(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                wrap = _parse_wrapped(_split_decl(v)[1])
            except ET.ParseError:
                return None
            return json.dumps(
                _simplify_element(wrap), separators=(",", ":")
            )
        return s.map(one)

    return _simplify(c)


# ---------------------------------------------------------------------------
# InsertXML / RemoveXML / Convert*XML — string -> string editors
# ---------------------------------------------------------------------------

def InsertXML(c: Column, xpath: str, subdoc) -> Column:
    """Insert ``subdoc``'s elements as last children of every element
    selected by ``xpath`` (func_insert_xml.go:42-86). ``subdoc`` may be
    a literal string or a Column."""
    sel, kind, _ = _compile_xpath(xpath)
    if kind not in ("element", "doc"):
        raise OTTLXPathError("InsertXML XPath must select elements")
    sub_is_col = isinstance(subdoc, Column)

    @pandas_udf("string")
    def _insert(s: pd.Series, sub: pd.Series) -> pd.Series:
        def one(v, subv):
            if v is None:
                return None
            decl, body = _split_decl(v)
            try:
                wrap = _parse_wrapped(body)
                subwrap = _parse_wrapped(subv if subv is not None else "")
            except ET.ParseError:
                return None
            targets = [wrap] if kind == "doc" else wrap.findall(sel)
            for t in targets:
                for child in list(subwrap):
                    t.append(copy.deepcopy(child))
            return decl + _serialize(wrap)
        return pd.Series([one(v, sv) for v, sv in zip(s, sub)])

    sub_col = subdoc if sub_is_col else F.lit(subdoc)
    return _insert(c.cast("string"), sub_col.cast("string"))


def RemoveXML(c: Column, xpath: str) -> Column:
    """Remove every node selected by ``xpath``: elements are detached,
    ``…/@attr`` drops the attribute, ``…/text()`` clears text
    (func_remove_xml.go:43-95; comments/CDATA are already folded by the
    ET parser)."""
    sel, kind, attr = _compile_xpath(xpath)

    @pandas_udf("string")
    def _remove(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            decl, body = _split_decl(v)
            try:
                wrap = _parse_wrapped(body)
            except ET.ParseError:
                return None
            if kind in ("element", "doc"):
                doomed = set(map(id, wrap.findall(sel)))
                if doomed:
                    for p in list(wrap.iter()):
                        for child in [c for c in list(p) if id(c) in doomed]:
                            # splice the tail so sibling text survives
                            idx = list(p).index(child)
                            tail = child.tail or ""
                            if idx:
                                prev = list(p)[idx - 1]
                                prev.tail = (prev.tail or "") + tail
                            else:
                                p.text = (p.text or "") + tail
                            p.remove(child)
            elif kind == "attr":
                for e in wrap.findall(sel):
                    if attr == "*":
                        e.attrib.clear()
                    else:
                        e.attrib.pop(attr, None)
            elif kind == "text":
                for e in wrap.findall(sel):
                    e.text = ""
                    for ch in e:
                        ch.tail = ""
            return decl + _serialize(wrap)
        return s.map(one)

    return _remove(c.cast("string"))


def ConvertAttributesToElementsXML(c: Column, xpath: str = "//@*") -> Column:
    """Convert selected attributes into child elements appended as last
    children, in document/attribute order
    (func_convert_attributes_to_elements_xml.go:44-69; default XPath
    ``//@*`` = every attribute in the document)."""
    sel, kind, attr = _compile_xpath(xpath or "//@*")
    if kind != "attr":
        raise OTTLXPathError(
            "ConvertAttributesToElementsXML XPath must select attributes "
            "(…/@name or //@*)"
        )

    @pandas_udf("string")
    def _convert(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            decl, body = _split_decl(v)
            try:
                wrap = _parse_wrapped(body)
            except ET.ParseError:
                return None
            matched = set(map(id, wrap.findall(sel)))
            for e in wrap.iter():
                if e is wrap or id(e) not in matched:
                    continue
                names = list(e.attrib) if attr == "*" else (
                    [attr] if attr in e.attrib else []
                )
                for name in names:
                    child = ET.SubElement(e, name)
                    child.text = e.attrib[name]
                for name in names:
                    del e.attrib[name]
            return decl + _serialize(wrap)
        return s.map(one)

    return _convert(c.cast("string"))


def _convert_text_for_node(e: ET.Element, name: str) -> None:
    """Recursive wrap rule (func_convert_text_to_elements_xml.go:63-107):
    wrap every non-whitespace text run in <name> iff the node holds
    more than one (value or element) child and at least one value."""
    for ch in e:
        _convert_text_for_node(ch, name)
    pieces = [(e.text or "").strip()] + [(ch.tail or "").strip() for ch in e]
    value_count = sum(1 for p in pieces if p)
    element_count = len(e)
    if value_count == 0 or element_count + value_count <= 1:
        return
    # rebuild: wrap each non-empty text run in place
    new_children: list[ET.Element] = []
    if pieces[0]:
        w = ET.Element(name)
        w.text = pieces[0]
        new_children.append(w)
        e.text = None
    for i, ch in enumerate(list(e)):
        new_children.append(ch)
        if pieces[i + 1]:
            w = ET.Element(name)
            w.text = pieces[i + 1]
            ch.tail = None
            new_children.append(w)
    for ch in list(e):
        e.remove(ch)
    for ch in new_children:
        e.append(ch)


def ConvertTextToElementsXML(
    c: Column, xpath: str = "/", element_name: str = "value"
) -> Column:
    """Wrap extraneous text nodes in a dedicated element
    (func_convert_text_to_elements_xml.go:48-107; defaults XPath="/",
    ElementName="value")."""
    sel, kind, _ = _compile_xpath(xpath or "/")
    if kind not in ("element", "doc"):
        raise OTTLXPathError("ConvertTextToElementsXML XPath must select elements")
    name = element_name or "value"

    @pandas_udf("string")
    def _convert(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            decl, body = _split_decl(v)
            try:
                wrap = _parse_wrapped(body)
            except ET.ParseError:
                return None
            targets = [wrap] if kind == "doc" else wrap.findall(sel)
            for t in targets:
                _convert_text_for_node(t, name)
            return decl + _serialize(wrap)
        return s.map(one)

    return _convert(c.cast("string"))
