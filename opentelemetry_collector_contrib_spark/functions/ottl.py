"""OTTL converter/function surface as Spark Column builders.

The reference registers 87 OTTL functions
(``pkg/ottl/ottlfuncs/functions.go:11-128``): lowercase *editors*
(mutate the record — see ``operators/transform.py``) and Uppercase
*converters* (pure). This module is the converter surface: every
function is a Python callable ``(Column...) -> Column`` built from
``pyspark.sql.functions`` so Catalyst codegens it; the few that have
no JVM builtin (FNV, UserAgent) are Arrow-vectorized pandas UDFs.

Semantics pinned to the Go implementations (file refs inline):
- OTTL ``Substring`` is 0-based with (start, length) and errors on
  out-of-range (func_substring.go) — we clamp instead (error_mode=
  ignore analog).
- ``Int``/``Double`` follow Go conversion: float→int truncates toward
  zero (func_int.go); invalid strings -> NULL (statement error modes
  route on null).
- OTTL math is int64/float64 with int/int integer division
  (``pkg/ottl/math.go:165-180``) — expose ``ottl_div`` for exactness.
- Time converters are ns-precision in Go; Spark timestamps are µs.
  ``UnixNano`` therefore returns µs*1000 (documented precision loss).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .strptime import strptime_to_spark


# ---------------------------------------------------------------------------
# string family
# ---------------------------------------------------------------------------

def Concat(delimiter: str, *cols: Column) -> Column:
    """Concat([...], delim) — func_concat.go joins stringified args."""
    return F.concat_ws(delimiter, *[c.cast("string") for c in cols])


def Format(fmt: str, *cols: Column) -> Column:
    """Format(fmt, [args]) — Go fmt.Sprintf (func_format.go)."""
    return F.format_string(fmt, *cols)


def Split(c: Column, delimiter: str) -> Column:
    # func_split.go uses strings.Split: literal delimiter, keep empties
    import re

    return F.split(c, re.escape(delimiter), -1)


def Substring(c: Column, start: int, length: int) -> Column:
    # OTTL is 0-based (func_substring.go); Spark substring is 1-based
    return F.substring(c, start + 1, length)


def Trim(c: Column, cutset: str = " ") -> Column:
    import re

    esc = re.escape(cutset)
    return F.regexp_replace(F.regexp_replace(c, f"^[{esc}]+", ""), f"[{esc}]+$", "")


def ToUpperCase(c: Column) -> Column:
    return F.upper(c)


def ToLowerCase(c: Column) -> Column:
    return F.lower(c)


def ToSnakeCase(c: Column) -> Column:
    """camelCase/PascalCase/kebab → snake (func_convert_case.go)."""
    s = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2")
    s = F.regexp_replace(s, r"([A-Z]+)([A-Z][a-z])", r"$1_$2")
    s = F.regexp_replace(s, r"[\s\-]+", "_")
    return F.lower(s)


def ToCamelCase(c: Column) -> Column:
    """snake/kebab/space-separated → CamelCase (Go strcase behavior:
    UpperCamel)."""
    parts = F.split(F.regexp_replace(c, r"[\s\-]+", "_"), "_")
    cap = F.transform(
        parts,
        lambda p: F.concat(F.upper(F.substring(p, 1, 1)), F.substring(p, 2, 1 << 20)),
    )
    return F.array_join(cap, "")


def ConvertCase(c: Column, to: str) -> Column:
    return {
        "upper": ToUpperCase, "lower": ToLowerCase,
        "snake": ToSnakeCase, "camel": ToCamelCase,
    }[to](c)


def HasPrefix(c: Column, prefix: str) -> Column:
    return c.startswith(prefix)


def HasSuffix(c: Column, suffix: str) -> Column:
    return c.endswith(suffix)


def Len(c: Column) -> Column:
    """Len works on strings, lists, maps (func_len.go)."""
    return F.length(c) if True else c  # caller picks size() for arrays


def LenArray(c: Column) -> Column:
    return F.size(c)


def String(c: Column) -> Column:
    return c.cast("string")


# ---------------------------------------------------------------------------
# regex / parse family
# ---------------------------------------------------------------------------

def IsMatch(c: Column, pattern: str) -> Column:
    return c.rlike(pattern)


def ExtractPatterns(c: Column, pattern: str) -> Column:
    """Named-capture regex -> MAP<STRING,STRING> of non-empty groups
    (func_extract_patterns.go). Accepts Go/Java ``(?<name>...)`` and
    Python ``(?P<name>...)`` named-group syntax."""
    import re as _re

    py_pattern = _re.sub(r"\(\?<([A-Za-z][A-Za-z0-9_]*)>", r"(?P<\1>", pattern)
    java_pattern = pattern.replace("(?P<", "(?<")
    groups = _re.compile(py_pattern).groupindex
    keys, vals = [], []
    for name, idx in groups.items():
        keys.append(F.lit(name))
        vals.append(F.regexp_extract(c, java_pattern, idx))
    m = F.map_from_arrays(F.array(*keys), F.array(*vals))
    return F.map_filter(m, lambda k, v: v != "")


def ParseJSON(c: Column, schema: str = "map<string,string>") -> Column:
    return F.from_json(c, schema)


def ParseCSV(c: Column, header: list[str], delimiter: str = ",") -> Column:
    sch = ", ".join(f"`{h}` string" for h in header)
    return F.from_csv(c, sch, {"sep": delimiter})


def ParseKeyValue(c: Column, pair_delim: str = " ", kv_delim: str = "=") -> Column:
    return F.str_to_map(c, F.lit(pair_delim), F.lit(kv_delim))


def ParseInt(c: Column, base: int = 10) -> Column:
    if base == 10:
        return c.try_cast("long")
    if base == 16:
        return F.conv(F.regexp_replace(c, "^0x", ""), 16, 10).cast("long")
    return F.conv(c, base, 10).cast("long")


def URL(c: Column) -> Column:
    """URL(url) -> map of parts (func_url.go semconv keys)."""
    return F.map_from_arrays(
        F.array(
            F.lit("url.scheme"), F.lit("url.domain"), F.lit("url.path"),
            F.lit("url.query"), F.lit("url.original"),
        ),
        F.array(
            F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)),
            F.parse_url(c, F.lit("HOST")),
            F.parse_url(c, F.lit("PATH")),
            F.parse_url(c, F.lit("QUERY")),
            c,
        ),
    )


def UserAgent(c: Column) -> Column:
    """UserAgent(ua) -> semconv map (func_user_agent.go uses the
    uap-go library; here: rule-based extraction of the major families
    — a pure-expr approximation covering the common agents)."""
    name = (
        F.when(c.rlike(r"Edg/"), "Edge")
        .when(c.rlike(r"OPR/|Opera"), "Opera")
        .when(c.rlike(r"Chrome/"), "Chrome")
        .when(c.rlike(r"Firefox/"), "Firefox")
        .when(c.rlike(r"Safari/") & c.rlike(r"Version/"), "Safari")
        .when(c.rlike(r"^curl/"), "curl")
        .when(c.rlike(r"^python-requests/"), "python-requests")
        .otherwise("Other")
    )
    def ext(pat: str) -> Column:
        # regexp_extract yields '' (not NULL) on no-match — nullif so
        # coalesce falls through correctly
        return F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))

    version = F.coalesce(
        ext(r"Edg/([\d.]+)"),
        F.when(name == "Chrome", ext(r"Chrome/([\d.]+)")),
        F.when(name == "Firefox", ext(r"Firefox/([\d.]+)")),
        F.when(name == "Safari", ext(r"Version/([\d.]+)")),
        ext(r"^[\w-]+/([\d.]+)"),
    )
    os_name = (
        F.when(c.rlike(r"Windows NT"), "Windows")
        .when(c.rlike(r"Android"), "Android")
        .when(c.rlike(r"iPhone|iPad"), "iOS")
        .when(c.rlike(r"Mac OS X"), "macOS")
        .when(c.rlike(r"Linux"), "Linux")
        .otherwise("Other")
    )
    return F.map_from_arrays(
        F.array(
            F.lit("user_agent.name"), F.lit("user_agent.version"), F.lit("os.name"),
            F.lit("user_agent.original"),
        ),
        F.array(name, version, os_name, c),
    )


def Decode(c: Column, encoding: str) -> Column:
    if encoding == "base64":
        return F.unbase64(c)
    if encoding == "hex":
        return F.unhex(c)
    if encoding in ("utf-8", "utf8"):
        return c.cast("string")
    raise ValueError(encoding)


def Base64Decode(c: Column) -> Column:  # deprecated alias in reference
    return F.unbase64(c)


# ---------------------------------------------------------------------------
# XML family (func_get_xml.go / func_parse_simplified_xml.go) — Spark's
# JVM-native xpath_* builtins cover the read-side converters; the
# insert/convert editors are out of scope (no XML writes in the model)
# ---------------------------------------------------------------------------

def GetXML(c: Column, xpath: str) -> Column:
    """GetXML(target, xpath) -> matched nodes' text values as an array
    (func_get_xml.go returns the matched document fragments; the text
    view is the load-bearing read path)."""
    return F.xpath(c, F.lit(xpath))


def GetXMLString(c: Column, xpath: str) -> Column:
    """First match as a string (empty -> '')."""
    return F.xpath_string(c, F.lit(xpath))


def GetXMLInt(c: Column, xpath: str) -> Column:
    return F.xpath_int(c, F.lit(xpath))


def ParseSimplifiedXML(c: Column, fields: dict[str, str]) -> Column:
    """ParseSimplifiedXML: XML -> map of {key: xpath-extracted value}
    (func_parse_simplified_xml.go flattens a document into attributes;
    here the flattening spec is explicit — schema-on-write)."""
    keys, vals = [], []
    for k, xp in fields.items():
        keys.append(F.lit(k))
        vals.append(F.xpath_string(c, F.lit(xp)))
    return F.map_filter(
        F.map_from_arrays(F.array(*keys), F.array(*vals)), lambda k, v: v != ""
    )


# ---------------------------------------------------------------------------
# time family (helper refs: ottlfuncs/func_time.go, func_duration.go,
# func_truncate_time.go, func_unix*.go, func_year.go..)
# ---------------------------------------------------------------------------

def Time(c: Column, layout: str) -> Column:
    """strptime-layout parse (func_time.go uses ctimefmt)."""
    return F.to_timestamp(c, strptime_to_spark(layout))


def FormatTime(c: Column, layout: str) -> Column:
    return F.date_format(c, strptime_to_spark(layout))


def TruncateTime(c: Column, unit: str) -> Column:
    """Duration-truncate: second/minute/hour/day (func_truncate_time.go
    takes a Duration; we expose the common units)."""
    return F.date_trunc(unit, c)


_DUR_UNITS = {"ns": 1, "us": 1_000, "µs": 1_000, "ms": 1_000_000, "s": 1_000_000_000,
              "m": 60_000_000_000, "h": 3_600_000_000_000}


def Duration(s: str) -> Column:
    """Parse a Go duration literal ('1h2m3s', '100ms') to int64 nanos
    (func_duration.go -> time.ParseDuration)."""
    import re as _re

    total = 0
    for num, unit in _re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)", s):
        total += int(float(num) * _DUR_UNITS[unit])
    return F.lit(total).cast("long")


def UnixSeconds(c: Column) -> Column:
    return c.cast("timestamp").cast("long")


def UnixMilli(c: Column) -> Column:
    return F.unix_millis(c.cast("timestamp"))


def UnixMicro(c: Column) -> Column:
    return F.unix_micros(c.cast("timestamp"))


def UnixNano(c: Column) -> Column:
    # µs-precision engine: ns = µs * 1000 (documented loss vs Go)
    return F.unix_micros(c.cast("timestamp")) * 1000


def Unix(seconds: Column) -> Column:
    return F.timestamp_seconds(seconds)


def Year(c: Column) -> Column:
    return F.year(c)


def Month(c: Column) -> Column:
    return F.month(c)


def Day(c: Column) -> Column:
    return F.dayofmonth(c)


def Weekday(c: Column) -> Column:
    # Go time.Weekday(): Sunday=0; Spark dayofweek: Sunday=1
    return F.dayofweek(c) - 1


def Hour(c: Column) -> Column:
    return F.hour(c)


def Minute(c: Column) -> Column:
    return F.minute(c)


def Second(c: Column) -> Column:
    return F.second(c)


def Hours(nanos: Column) -> Column:
    """Duration (int64 ns) -> float hours (func_hours.go)."""
    return nanos.cast("double") / 3_600_000_000_000


def Minutes(nanos: Column) -> Column:
    return nanos.cast("double") / 60_000_000_000


def Seconds(nanos: Column) -> Column:
    return nanos.cast("double") / 1_000_000_000


def Milliseconds(nanos: Column) -> Column:
    return nanos.cast("double") / 1_000_000


def Microseconds(nanos: Column) -> Column:
    return nanos.cast("double") / 1_000


def Nanoseconds(nanos: Column) -> Column:
    return nanos.cast("long")


# ---------------------------------------------------------------------------
# hash / id family
# ---------------------------------------------------------------------------

def MD5(c: Column) -> Column:
    return F.md5(c.cast("string"))


def SHA1(c: Column) -> Column:
    return F.sha1(c.cast("string"))


def SHA256(c: Column) -> Column:
    return F.sha2(c.cast("string"), 256)


def SHA512(c: Column) -> Column:
    return F.sha2(c.cast("string"), 512)


def Murmur3Hash(c: Column) -> Column:
    """Spark's hash() IS murmur3_x86_32 (same family as
    func_murmur3_hash.go); returned as int."""
    return F.hash(c)


def Hex(c: Column) -> Column:
    return F.lower(F.hex(c))


_fnv64_cache = None


def _fnv64():
    """FNV-1a 64-bit (func_fnv.go -> hash/fnv). No JVM builtin; Arrow
    batch path. Built lazily — pandas_udf registration needs an active
    session. Returns Go int64 (wrapping)."""
    global _fnv64_cache
    if _fnv64_cache is None:

        @pandas_udf("long")
        def fnv(s: pd.Series) -> pd.Series:
            def one(x):
                if x is None:
                    return None
                h = 0xCBF29CE484222325
                for b in str(x).encode():
                    h ^= b
                    h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                return h - (1 << 64) if h >= (1 << 63) else h

            return s.map(one)

        _fnv64_cache = fnv
    return _fnv64_cache


def FNV(c: Column) -> Column:
    return _fnv64()(c.cast("string"))


def UUID(seed: Column) -> Column:
    """Deterministic UUIDv4-shaped id derived from md5 of a seed column
    (the reference's UUID() is random; randomness is banned here —
    derive from stable row content)."""
    h = F.md5(seed.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("4"), F.substring(h, 14, 3)),
        F.concat(F.lit("8"), F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def TraceID(hex_col: Column) -> Column:
    return F.lower(F.regexp_extract(hex_col, r"^([0-9a-fA-F]{32})$", 1))


def SpanID(hex_col: Column) -> Column:
    return F.lower(F.regexp_extract(hex_col, r"^([0-9a-fA-F]{16})$", 1))


# ---------------------------------------------------------------------------
# math / type family
# ---------------------------------------------------------------------------

def Double(c: Column) -> Column:
    return c.try_cast("double")


def Int(c: Column) -> Column:
    """Go int64 conversion: float truncates toward zero; bad strings
    -> NULL (func_int.go)."""
    return c.try_cast("double").cast("long")


def Log(c: Column) -> Column:
    return F.log(c)


def IsBool(c: Column) -> Column:
    return F.lit(dict(c.__dict__) is not None) if False else _is_type(c, "boolean")


def _is_type(c: Column, t: str) -> Column:
    # Spark schemas are static: typeof is a plan-time property. Expose
    # the dynamic OTTL Is* as a try-cast check for string inputs.
    return c.try_cast(t).isNotNull()


def IsDouble(c: Column) -> Column:
    return _is_type(c, "double")


def IsInt(c: Column) -> Column:
    return _is_type(c, "long")


def IsString(c: Column) -> Column:
    return c.cast("string").isNotNull()


def IsValidLuhn(c: Column) -> Column:
    """Luhn checksum over a digit string (func_is_valid_luhn.go) —
    pure array exprs: reverse digits, double every 2nd, sum."""
    digits = F.split(F.reverse(c.cast("string")), "")
    valid_chars = F.size(F.filter(digits, lambda d: ~d.rlike(r"^[0-9]$"))) == 0
    total = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(0), F.size(digits) - 1),
            lambda d, i: F.when(
                i % 2 == 1,
                F.when(d.try_cast("int") * 2 > 9, d.try_cast("int") * 2 - 9).otherwise(d.try_cast("int") * 2),
            ).otherwise(d.try_cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return valid_chars & (F.length(c.cast("string")) > 1) & (total % 10 == 0)


def ottl_div(a: Column, b: Column, int_math: bool) -> Column:
    """OTTL '/' (pkg/ottl/math.go:165-180): int/int is integer
    division; /0 is a statement error -> NULL under error_mode=ignore."""
    if int_math:
        return F.when(b != 0, (a / b).cast("long"))
    return F.when(b != 0.0, a / b)


# ---------------------------------------------------------------------------
# map / list family
# ---------------------------------------------------------------------------

def Keys(m: Column) -> Column:
    return F.map_keys(m)


def Values(m: Column) -> Column:
    return F.map_values(m)


def Sort(arr: Column, order: str = "asc") -> Column:
    s = F.array_sort(arr)
    return s if order == "asc" else F.reverse(s)


def SliceToMap(arr: Column, key_fn=None) -> Column:
    """array<struct<key,value>> or array<string> -> map
    (func_slice_to_map.go keys by a path; here: by element or struct
    field 'key')."""
    if key_fn is None:
        key_fn = lambda e: e  # noqa: E731
    return F.map_from_arrays(F.transform(arr, key_fn), arr)


def ContainsValue(arr: Column, value) -> Column:
    return F.array_contains(arr, value)


def Append(arr: Column, *values: Column) -> Column:
    return F.concat(arr, F.array(*values))


def ToKeyValueString(m: Column, pair_delim: str = " ", kv_delim: str = "=") -> Column:
    """map -> 'k=v k2=v2' sorted by key (func_to_key_value_string.go)."""
    entries = F.array_sort(F.map_entries(m))
    return F.array_join(
        F.transform(entries, lambda e: F.concat(e["key"], F.lit(kv_delim), e["value"])),
        pair_delim,
    )


# ---------------------------------------------------------------------------
# registry (name -> callable), mirroring ottlfuncs/functions.go
# ---------------------------------------------------------------------------

OTTL_CONVERTERS = {
    "Concat": Concat, "Format": Format, "Split": Split, "Substring": Substring,
    "Trim": Trim, "ToUpperCase": ToUpperCase, "ToLowerCase": ToLowerCase,
    "ToCamelCase": ToCamelCase, "ToSnakeCase": ToSnakeCase, "ConvertCase": ConvertCase,
    "HasPrefix": HasPrefix, "HasSuffix": HasSuffix, "Len": Len, "String": String,
    "IsMatch": IsMatch, "ExtractPatterns": ExtractPatterns, "ParseJSON": ParseJSON,
    "ParseCSV": ParseCSV, "ParseKeyValue": ParseKeyValue, "ParseInt": ParseInt,
    "URL": URL, "UserAgent": UserAgent, "Decode": Decode, "Base64Decode": Base64Decode,
    "GetXML": GetXML, "GetXMLString": GetXMLString, "GetXMLInt": GetXMLInt,
    "ParseSimplifiedXML": ParseSimplifiedXML,
    "Time": Time, "FormatTime": FormatTime, "TruncateTime": TruncateTime,
    "Duration": Duration, "UnixSeconds": UnixSeconds, "UnixMilli": UnixMilli,
    "UnixMicro": UnixMicro, "UnixNano": UnixNano, "Unix": Unix,
    "Year": Year, "Month": Month, "Day": Day, "Weekday": Weekday,
    "Hour": Hour, "Minute": Minute, "Second": Second,
    "Hours": Hours, "Minutes": Minutes, "Seconds": Seconds,
    "Milliseconds": Milliseconds, "Microseconds": Microseconds,
    "Nanoseconds": Nanoseconds,
    "MD5": MD5, "SHA1": SHA1, "SHA256": SHA256, "SHA512": SHA512,
    "Murmur3Hash": Murmur3Hash, "Hex": Hex, "FNV": FNV, "UUID": UUID,
    "TraceID": TraceID, "SpanID": SpanID,
    "Double": Double, "Int": Int, "Log": Log,
    "IsDouble": IsDouble, "IsInt": IsInt, "IsString": IsString,
    "IsValidLuhn": IsValidLuhn,
    "Keys": Keys, "Values": Values, "Sort": Sort, "SliceToMap": SliceToMap,
    "ContainsValue": ContainsValue, "Append": Append,
    "ToKeyValueString": ToKeyValueString,
}
