"""Faro EXPORT translator: OTLP logs -> Faro payloads
(``pkg/translator/faro/logs_to_faro.go``; the receive direction is
``operators/faro.py::faro_to_logs``).

Per record (:198-233): the logfmt body decodes to a kv map
(go-logfmt semantics — quoted values unescape, bare tokens keep empty
values), the ``kind`` key dispatches to log / event / measurement /
exception extraction, and the meta block assembles from the kv pairs
with resource attrs taking priority for app fields (:373-430):

- log         — :598-669: message/level word-gate/timestamp,
  context_* map, traceID/spanID, action id/name/parent
- event       — :671-689: name/domain + event_data_* attrs
- measurement — :792-843: type, value_* floats, context_*
- exception   — :691-790: type/value/context, the stacktrace string
  split on "\\n  at " with the frame regexp
  ``(func)? \\(((module)|)?(file)?:(line)?:(col)?\\)`` ported intact
- meta        — :299-596: app (resource service.* wins over
  app_* keys, the custom "app"/"app_bundle_id" resource attrs),
  browser incl. brands from the brands string OR the
  browser_brand_<n>_<field> fan, geo, k6, page/session/user attrs
  by prefix, sdk with "name:version" integration pairs, view

Payloads then MERGE per identical meta (:141-155 hashes the encoded
meta; here the canonical sorted-key meta JSON is the groupBy key —
same equivalence, and the grouping is the scale-relevant shuffle).
Item order inside a merged payload follows the input id order (the
reference appends in arrival order).

The record parse is ONE Arrow-batched UDF (a faithful port — logfmt
decoding and the frame regexp are imperative string work, the same
pattern as the windows-event and msgpack decoders); everything after
it is Column algebra + one groupBy.  Item timestamps stay the raw
RFC3339Milli strings (the Go time.Time round-trip is rendering, not
semantics).
"""
from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FRAME_RE = re.compile(
    r"(?P<function>.+)?\s\(((?P<module>.+)\|)?(?P<filename>.+)?:"
    r"(?P<lineno>\d+)?:(?P<colno>\d+)?\)$")

_META_KEYS = {
    "sdk": ["sdk_name", "sdk_version"],
    "geo": ["geo_continent_iso", "geo_country_iso",
            "geo_subdivision_iso", "geo_city", "geo_asn_org",
            "geo_asn_id"],
    "browser": ["browser_name", "browser_version", "browser_os",
                "browser_language", "browser_userAgent",
                "browser_viewportHeight", "browser_viewportWidth"],
}


def _parse_logfmt(line: str) -> dict:
    kv: dict = {}
    i, n = 0, len(line)
    while i < n:
        while i < n and line[i] == " ":
            i += 1
        if i >= n:
            break
        j = i
        while j < n and line[j] not in " =":
            j += 1
        key = line[i:j]
        val = ""
        if j < n and line[j] == "=":
            j += 1
            if j < n and line[j] == '"':
                k = j + 1
                buf = []
                while k < n:
                    c = line[k]
                    if c == "\\" and k + 1 < n:
                        buf.append({"n": "\n", "t": "\t",
                                    '"': '"', "\\": "\\"}.get(
                            line[k + 1], line[k + 1]))
                        k += 2
                        continue
                    if c == '"':
                        k += 1
                        break
                    buf.append(c)
                    k += 1
                val = "".join(buf)
                j = k
            else:
                k = j
                while k < n and line[k] != " ":
                    k += 1
                val = line[j:k]
                j = k
        if key:
            kv[key] = val
        i = j
    return kv


def _prefixed(kv: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in kv.items()
            if k.startswith(prefix)}


def _trace_action(kv: dict) -> dict:
    out = {}
    if "traceID" in kv:
        out["trace_id"] = kv["traceID"]
    if "spanID" in kv:
        out["span_id"] = kv["spanID"]
    act = {}
    for src, dst in (("action_id", "id"), ("action_name", "name"),
                     ("action_parent_id", "parent_id")):
        if src in kv:
            act[dst] = kv[src]
    if act:
        out["action"] = act
    return out


def _extract_meta(kv: dict, res: dict) -> dict:
    app = {}
    if res.get("service.name"):
        app["name"] = res["service.name"]
    elif res.get("app"):
        app["name"] = res["app"]
    elif kv.get("app_name"):
        app["name"] = kv["app_name"]
    if res.get("service.namespace"):
        app["namespace"] = res["service.namespace"]
    elif kv.get("app_namespace"):
        app["namespace"] = kv["app_namespace"]
    if res.get("service.version"):
        app["version"] = res["service.version"]
    elif kv.get("app_version"):
        app["version"] = kv["app_version"]
    if res.get("deployment.environment"):
        app["environment"] = res["deployment.environment"]
    elif kv.get("app_environment"):
        app["environment"] = kv["app_environment"]
    if res.get("app_bundle_id"):
        app["bundle_id"] = res["app_bundle_id"]
    if kv.get("app_release"):
        app["release"] = kv["app_release"]

    browser = {k.split("_", 1)[1]: kv[k]
               for k in _META_KEYS["browser"] if k in kv}
    if "browser_mobile" in kv:
        browser["mobile"] = kv["browser_mobile"] == "true"
    if "browser_brands" in kv:
        browser["brands"] = kv["browser_brands"]
    else:
        brands_map: dict = {}
        for k, v in kv.items():
            if not k.startswith("browser_brand_"):
                continue
            idx_s, field = k[len("browser_brand_"):].split("_", 1)
            b = brands_map.setdefault(int(idx_s), {})
            if field == "brand":
                b["brand"] = v
            elif field == "version":
                b["version"] = v
        if brands_map:
            browser["brands"] = [brands_map[i]
                                 for i in sorted(brands_map)]

    meta = {"app": app, "browser": browser,
            "geo": {k.split("_", 1)[1]: kv[k]
                    for k in _META_KEYS["geo"] if k in kv},
            "k6": {"is_k6_browser": kv.get("k6_isK6Browser")
                   == "true"} if "k6_isK6Browser" in kv else {},
            "page": {**({"id": kv["page_id"]} if "page_id" in kv
                        else {}),
                     **({"url": kv["page_url"]} if "page_url" in kv
                        else {}),
                     **({"attributes": _prefixed(kv, "page_attr_")}
                        if _prefixed(kv, "page_attr_") else {})},
            "session": {**({"id": kv["session_id"]}
                           if "session_id" in kv else {}),
                        **({"attributes":
                            _prefixed(kv, "session_attr_")}
                           if _prefixed(kv, "session_attr_")
                           else {})},
            "user": {**({"id": kv["user_id"]} if "user_id" in kv
                        else {}),
                     **({"email": kv["user_email"]}
                        if "user_email" in kv else {}),
                     **({"username": kv["user_username"]}
                        if "user_username" in kv else {}),
                     **({"attributes": _prefixed(kv, "user_attr_")}
                        if _prefixed(kv, "user_attr_") else {})},
            "sdk": {k.split("_", 1)[1]: kv[k]
                    for k in _META_KEYS["sdk"] if k in kv},
            "view": {"name": kv["view_name"]}
            if "view_name" in kv else {}}
    if "sdk_integrations" in kv and kv["sdk_integrations"]:
        meta["sdk"]["integrations"] = [
            {"name": p.split(":")[0], "version": p.split(":")[1]}
            for p in kv["sdk_integrations"].split(",")]
    return meta


def _extract_item(kind: str, kv: dict) -> dict:
    ctx = _prefixed(kv, "context_")
    item: dict = {}
    if "timestamp" in kv:
        item["timestamp"] = kv["timestamp"]
    item.update(_trace_action(kv))
    if kind == "log":
        if "message" in kv:
            item["message"] = kv["message"]
        if kv.get("level") in ("error", "warning", "trace", "info",
                               "debug"):
            item["level"] = kv["level"]
        if ctx:
            item["context"] = ctx
    elif kind == "event":
        if "event_name" in kv:
            item["name"] = kv["event_name"]
        if "event_domain" in kv:
            item["domain"] = kv["event_domain"]
        attrs = _prefixed(kv, "event_data_")
        if attrs:
            item["attributes"] = attrs
    elif kind == "measurement":
        if "type" in kv:
            item["type"] = kv["type"]
        vals = {k: float(v)
                for k, v in _prefixed(kv, "value_").items()}
        if vals:
            item["values"] = vals
        if ctx:
            item["context"] = ctx
    elif kind == "exception":
        if "type" in kv:
            item["type"] = kv["type"]
        if "value" in kv:
            item["value"] = kv["value"]
        if ctx:
            item["context"] = ctx
        if "stacktrace" in kv:
            st = kv["stacktrace"]
            head = f"{kv.get('type', '')}: {kv.get('value', '')}"
            if st.startswith(head):
                st = st[len(head):]
            frames = []
            for fs in st.split("\n  at "):
                if fs == "":
                    continue
                m = _FRAME_RE.search(fs)
                if not m:
                    continue
                fr = {"function": m.group("function") or "",
                      "module": m.group("module") or "",
                      "filename": m.group("filename") or ""}
                if m.group("lineno"):
                    fr["lineno"] = int(m.group("lineno"))
                if m.group("colno"):
                    fr["colno"] = int(m.group("colno"))
                frames.append(fr)
            item["stacktrace"] = {"frames": frames} if frames else {}
    return item


def _faro_batch(body: pd.Series, res_json: pd.Series) -> pd.Series:
    out = []
    for b, rj in zip(body, res_json):
        try:
            kv = _parse_logfmt(b or "")
            kind = kv.get("kind")
            if kind not in ("log", "event", "measurement",
                            "exception"):
                out.append(json.dumps({"err": "bad kind"}))
                continue
            res = json.loads(rj) if rj else {}
            meta = _extract_meta(kv, res)
            item = _extract_item(kind, kv)
            out.append(json.dumps(
                {"kind": kind, "item": item,
                 "meta": json.dumps(meta, sort_keys=True)},
                sort_keys=True))
        except Exception as exc:  # dead-letter, mirrors errs append
            out.append(json.dumps({"err": str(exc)}))
    return pd.Series(out)


def logs_to_faro_payloads(df: DataFrame, *,
                          id_cols: list[str]) -> DataFrame:
    # asNondeterministic pins ONE evaluation — otherwise Catalyst
    # re-inlines the UDF into both the dead-letter filter and the
    # projection, decoding every body twice
    udf = pandas_udf(_faro_batch,
                     returnType="string").asNondeterministic()
    parsed = df.select(
        *id_cols,
        F.from_json(
            udf(F.coalesce(F.col("body"), F.lit("")),
                F.to_json(F.col("res_attrs"))),
            "struct<kind:string,item:string,meta:string,err:string>")
        .alias("_p"))
    ok = parsed.filter(F.col("_p")["err"].isNull()).select(
        *id_cols,
        F.col("_p")["kind"].alias("_kind"),
        F.col("_p")["item"].alias("_item"),
        F.col("_p")["meta"].alias("meta_json"))
    idc = F.col(id_cols[0])
    items = lambda k: F.transform(  # noqa: E731
        F.array_sort(F.collect_list(F.when(
            F.col("_kind") == k,
            F.struct(idc.alias("i"), F.col("_item").alias("v"))))),
        lambda x: x["v"])
    return (ok.groupBy("meta_json")
            .agg(items("log").alias("logs"),
                 items("event").alias("events"),
                 items("measurement").alias("measurements"),
                 items("exception").alias("exceptions"),
                 F.count(F.lit(1)).alias("record_count")))
