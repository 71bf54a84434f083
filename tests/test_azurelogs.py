"""azurelogs translator — golden cases pinned VERBATIM from the
reference's pkg/translator/azurelogs/testdata (valid_1 inputs and
their *_expected.yaml), plus the asSeverity table and the error /
fallback edge semantics."""
from __future__ import annotations

import json

from opentelemetry_collector_contrib_spark.operators.azurelogs import (
    azurelogs_parse,
)


def _run(spark, batch: dict, version: str = "1.2.3"):
    df = spark.createDataFrame([(json.dumps(batch),)], "body string")
    return [r.asDict() for r in
            azurelogs_parse(df, version=version).collect()]


def _canon(tokens: list[str]) -> str:
    return ",".join(sorted(tokens))


CDN_VALID_1 = {
    "records": [{
        "time": "2025-04-23T09:17:17.0000000Z",
        "resourceId": "/SUBSCRIPTIONS/123CA/RESOURCEGROUPS/OPENTELEMETRY"
                      "/PROVIDERS/MICROSOFT.CDN/PROFILES"
                      "/OPENTELEMETRY-CDN-PROFILE",
        "category": "AzureCdnAccessLog",
        "operationName": "Microsoft.Cdn/Profiles/AccessLog/Write",
        "properties": {
            "trackingReference": "ref-1s5s",
            "httpMethod": "GET",
            "httpVersion": "1.1.0.0",
            "requestUri": "https://ep.azureedge.net:443/favicon.ico",
            "sni": "N/A",
            "requestBytes": "1572",
            "responseBytes": "2027",
            "userAgent": "Mozilla/5.0",
            "clientIp": "13.83.128.90",
            "clientPort": "37908",
            "socketIp": "147.243.241.243",
            "timeToFirstByte": "0.154",
            "timeTaken": "0.154",
            "requestProtocol": "HTTPS",
            "securityProtocol": "TLS 1.3",
            "rulesEngineMatchNames": [],
            "httpStatusCode": "404",
            "httpStatusDetails": "404",
            "pop": "CO",
            "cacheStatus": "MISS",
            "errorInfo": "NoError",
            "ErrorInfo": "NoError",
            "result": "N/A",
            "endpoint": "ep.azureedge.net",
            "isReceivedFromClient": False,
            "backendHostname": "example.com:443",
        },
    }]
}

# testdata/azurecdnaccesslog/valid_1_expected.yaml, token form
CDN_EXPECTED = _canon([
    "http.request.size=1572", "http.response.size=2027",
    "client.port=37908", "http.response.status_code=404",
    "azure.time_to_first_byte=154", "duration=154",
    "url.original=https://ep.azureedge.net:443/favicon.ico",
    "url.port=443", "url.scheme=https", "url.path=/favicon.ico",
    "tls.protocol.name=TLS", "tls.protocol.version=1.3",
    "destination.address=example.com", "destination.port=443",
    "network.peer.address=ep.azureedge.net",
    "azure.ref=ref-1s5s", "http.request.method=GET",
    "network.protocol.version=1.1.0.0", "network.protocol.name=HTTPS",
    "user_agent.original=Mozilla/5.0", "client.address=13.83.128.90",
    "source.address=147.243.241.243", "azure.pop=CO",
    "azure.cache_status=MISS", "network.io.direction=transmit",
    "azure.category=AzureCdnAccessLog",
    "azure.operation.name=Microsoft.Cdn/Profiles/AccessLog/Write",
])


def test_cdn_golden_valid_1(spark):
    rows = _run(spark, CDN_VALID_1)
    assert len(rows) == 1
    r = rows[0]
    assert r["az2_ts_ns"] == 1745399837000000000
    assert r["az2_err"] is False
    assert r["az2_attrs"] == CDN_EXPECTED
    assert r["az2_body"] is None
    assert r["az2_scope_name"] == "otelcol/azureresourcelogs"
    assert r["az2_scope_version"] == "1.2.3"


WAF_VALID_1 = {
    "records": [{
        "time": "2025-04-24T15:35:06.0000000Z",
        "resourceId": "/SUBSCRIPTIONS/OT-SUB/X",
        "category": "FrontDoorWebApplicationFirewallLog",
        "operationName": "Microsoft.Cdn/Profiles/WAFLog/Write",
        "properties": {
            "clientIP": "2001:1c00::ebfc",
            "clientPort": "57660",
            "socketIP": "2001:1c00::ebfc",
            "requestUri": "http://ot.z01.azurefd.net:80/",
            "ruleName": "Rule1",
            "policy": "policy",
            "action": "Block",
            "host": "ot.z01.azurefd.net",
            "trackingReference": "ref-d207",
            "policyMode": "prevention",
            "details": {"matches": [], "msg": "", "data": ""},
        },
    }]
}

WAF_EXPECTED = _canon([
    "client.port=57660",
    "url.original=http://ot.z01.azurefd.net:80/",
    "url.port=80", "url.scheme=http", "url.path=/",
    "client.address=2001:1c00::ebfc", "source.address=2001:1c00::ebfc",
    "azure.ref=ref-d207",
    "http.request.header.host=ot.z01.azurefd.net",
    "azure.frontdoor.waf.policy.name=policy",
    "azure.frontdoor.waf.policy.mode=prevention",
    "azure.frontdoor.waf.rule.name=Rule1",
    "azure.frontdoor.waf.action=Block",
    "azure.category=FrontDoorWebApplicationFirewallLog",
    "azure.operation.name=Microsoft.Cdn/Profiles/WAFLog/Write",
])


def test_waf_golden_valid_1(spark):
    rows = _run(spark, WAF_VALID_1)
    assert len(rows) == 1
    r = rows[0]
    assert r["az2_ts_ns"] == 1745508906000000000
    assert r["az2_attrs"] == WAF_EXPECTED


def test_as_severity_table(spark):
    # resourcelogs_to_logs_test.go TestAsSeverity (+ numeric passthrough)
    recs = [{"time": "2024-01-01T00:00:00Z", "resourceId": "/r",
             "operationName": "op", "category": "M", "Level": lv,
             "properties": {"k": "v"}}
            for lv in ["Informational", "Warning", "Error", "Critical",
                       "unknown", "7"]]
    rows = _run(spark, {"records": recs})
    assert [r["az2_sev_num"] for r in rows] == [9, 13, 17, 21, 0, 7]
    assert [r["az2_sev_text"] for r in rows] == [
        "Informational", "Warning", "Error", "Critical", "unknown", "7"]


def test_required_int_failure_drops_attrs_keeps_record(spark):
    # putInt error -> record kept, no attrs, no body
    # (resourcelogs_to_logs.go:137-160)
    rec = json.loads(json.dumps(CDN_VALID_1["records"][0]))
    rec["properties"]["requestBytes"] = "not-a-number"
    rows = _run(spark, {"records": [rec]})
    r = rows[0]
    assert r["az2_err"] is True
    assert r["az2_attrs"] is None and r["az2_body"] is None
    assert r["az2_ts_ns"] == 1745399837000000000


def test_error_info_mismatch_is_error(spark):
    rec = json.loads(json.dumps(CDN_VALID_1["records"][0]))
    rec["properties"]["errorInfo"] = "OriginTimeout"
    rec["properties"]["ErrorInfo"] = "SomethingElse"
    rows = _run(spark, {"records": [rec]})
    assert rows[0]["az2_err"] is True


def test_unparsable_time_skips_record(spark):
    rec = {"time": "bogus", "resourceId": "/r", "operationName": "op",
           "category": "M", "properties": {"k": "v"}}
    assert _run(spark, {"records": [rec]}) == []


def test_fallback_appservice_platform(spark):
    # property_names.go handleAppServicePlatformLogs
    rec = {"time": "2024-01-01T00:00:00Z", "resourceId": "/r",
           "operationName": "op", "category": "AppServicePlatformLogs",
           "properties": {"containerId": "c1", "containerName": "web",
                          "exception": "Boom", "other": "o1"}}
    rows = _run(spark, {"records": [rec]})
    body = rows[0]["az2_body"]
    assert "container.id=c1" in body
    assert "container.name=web" in body
    assert "error.type=Boom" in body
    assert 'properties={"other":"o1"}' in body
    assert rows[0]["az2_attrs"] is None


def test_fallback_healthprobe_latencies(spark):
    rec = {"time": "2024-01-01T00:00:00Z", "resourceId": "/r",
           "operationName": "op", "category": "FrontDoorHealthProbeLog",
           "properties": {"httpVerb": "HEAD", "httpStatusCode": "200",
                          "DNSLatencyMicroseconds": "2600",
                          "totalLatencyMilliseconds": "42",
                          "probeURL": "https://p.com/h"}}
    body = _run(spark, {"records": [rec]})[0]["az2_body"]
    assert "dns.lookup.duration=0.0026" in body
    assert "http.request.duration=0.042" in body
    assert "http.request.method=HEAD" in body
    assert "http.response.status_code=200" in body
