"""Batch fuzz: statsd_parse vs a pure-Python port of the reference
parser (statsd_parser.go parseMessageToMetric :346-460).

One seeded generator builds ~600 lines mixing well-formed messages
with adversarial junk; ALL lines run through the vectorized parser in
ONE Spark job and every row is compared field-for-field against the
Python port — ok flag, name, value, type, effective rate, canonical
attrs, addition flag.
"""

from __future__ import annotations

import random
import re

from opentelemetry_collector_contrib_spark.operators.receivers import statsd_parse

_TYPES = ["c", "g", "h", "ms", "d", "q", "", "cc"]

_INF_TOKENS = re.compile(r"^[+-]?inf(inity)?$", re.IGNORECASE)
_ZERO_TOKENS = re.compile(r"^[+-]?(0+(\.0*)?|\.0+)([eE][+-]?[0-9]+)?$")


def _go_float(s: str) -> float:
    """strconv.ParseFloat(s, 64): Python's float() silently clamps
    out-of-range finite tokens to ±Inf / 0.0, Go returns ErrRange and
    the reference rejects the line (statsd_parser.go:388-393,
    447-450). Raise on those; accept spelled-out inf/nan."""
    v = float(s)  # raises ValueError on syntax, same as Go
    if v != v and s[:1] in "+-":
        # Go's special() only accepts UNSIGNED nan: the sign case
        # falls through to the infinity check, never the nan one
        # (strconv/atof.go special()) — '+nan' is a syntax error
        raise ValueError(f"signed nan: {s}")
    if v in (float("inf"), float("-inf")) and not _INF_TOKENS.match(s):
        raise ValueError(f"range error: {s}")
    if v == 0.0 and not _ZERO_TOKENS.match(s):
        raise ValueError(f"range error: {s}")
    return v


def _py_parse(line: str, enable_simple_tags: bool = False):
    """Port of parseMessageToMetric; returns None on error, else a
    dict with name/value/type/rate/attrs/addition."""
    name_value, sep, rest = line.partition("|")
    if not sep:
        return None
    name, sep2, value_str = name_value.partition(":")
    if not sep2 or name == "" or value_str == "":
        return None
    addition = value_str.startswith(("-", "+"))
    metric_type, _, additional = rest.partition("|")
    if metric_type not in ("c", "g", "h", "ms", "d"):
        return None
    kvs: dict[str, str] = {}
    rate = None
    ts = None
    part, _, additional = additional.partition("|")
    while part != "":
        if part.startswith("@"):
            try:
                rate = _go_float(part[1:])
            except ValueError:
                return None
        elif part.startswith("#"):
            tags = part[1:]
            if tags != "":
                for tag in tags.split(","):
                    if tag == "":
                        # Go's Cut loop TERMINATES at the first empty
                        # element — the remainder is discarded, not
                        # validated (statsd_parser.go:405-406)
                        break
                    k, s3, v = tag.partition(":")
                    if k == "":
                        return None
                    if (not s3 or v == "") and not enable_simple_tags:
                        return None
                    kvs[k] = v
        elif part.startswith("c:"):
            if part[2:] != "":
                kvs["container.id"] = part[2:]
        elif part.startswith("T"):
            if metric_type not in ("c", "g"):
                return None
            if not part[1:].isdigit() or part[1:] == "":
                return None
            ts = int(part[1:])
            if ts > 2**63 - 1:  # engine bounds at int64 (documented)
                return None
        else:
            return None
        part, _, additional = additional.partition("|")
    try:
        value = _go_float(value_str)
    except ValueError:
        return None
    return {
        "name": name,
        "value": value,
        "type": metric_type,
        "rate": rate,
        "attrs": ",".join(sorted(f"{k}:{v}" for k, v in kvs.items())),
        "addition": addition,
        "ts": ts,
    }


def _gen_lines(n: int, seed: int = 20260818) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for _ in range(n):
        mode = rng.random()
        if mode < 0.15:
            # pure junk
            lines.append(
                "".join(
                    rng.choice("abc:|@#.0123T+-")
                    for _ in range(rng.randint(0, 14))
                )
            )
            continue
        name = rng.choice(["cpu", "mem.used", "a-b_c", "", "x y"])
        sign = rng.choice(["", "", "", "+", "-"])
        val = rng.choice(
            ["5", "3.25", "", "1e2", "abc", "0.5", "1e300",
             "1e309", "inf", "nan", "1e-400", "0.0", "0e99"]
        )
        typ = rng.choice(_TYPES)
        parts = [f"{name}:{sign}{val}", typ]
        for _ in range(rng.randint(0, 4)):
            kind = rng.random()
            if kind < 0.25:
                parts.append("@" + rng.choice(
                    ["0.5", "2", "0.25", "x", "", "1e309", "inf", "1e-400"]))
            elif kind < 0.5:
                parts.append(
                    "#" + rng.choice(
                        ["env:prod", "a:1,b:2", "bare", ":v", "k:", "",
                         "a:1,,b:2", "a:1,,junk", "a:1,", ",b:2",
                         "a:1,,:bad"]
                    )
                )
            elif kind < 0.65:
                parts.append("c:" + rng.choice(["abc", ""]))
            elif kind < 0.8:
                parts.append("T" + rng.choice(
                    ["1700000000", "12x", "", "99999999999999999999"]))
            else:
                # empty / unrecognized parts: the reference STOPS at
                # the first empty part ('cpu:1|c|' and 'cpu:1|c||#bad'
                # are valid, remainder discarded) and errors on an
                # unrecognized non-empty part
                parts.append(rng.choice(["", "", "xyz", "t5", "Q:1"]))
        lines.append("|".join(parts))
    # pinned regression shapes from the round-5 ADVICE, verbatim
    lines += [
        "cpu:1|c|", "cpu:1|c||#bad", "cpu:1|c||", "cpu:1|c|#a:1,,b:2",
        "cpu:1|c|#a:1,,junk", "cpu:1e309|c", "cpu:1|c|@1e309",
        "cpu:inf|c", "cpu:-inf|g", "cpu:nan|ms", "cpu:1e-400|c",
        "cpu:1|c|#a:1,|@0.5", "cpu:1|c||T99x", "cpu:0e310|c",
        "cpu:+nan|c", "cpu:-nan|g", "cpu:NAN|c", "cpu:+inf|c",
    ]
    return lines


def test_statsd_parse_matches_python_port(spark):
    lines = _gen_lines(600)
    df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "event_id long, body string"
    )
    rows = {r["event_id"]: r for r in statsd_parse(df).collect()}
    mismatches = []
    for i, ln in enumerate(lines):
        want = _py_parse(ln)
        got = rows[i]
        if want is None:
            if got["sd_ok"]:
                mismatches.append((ln, "expected error, parser ok", dict(
                    name=got["sd_name"], value=got["sd_value"])))
            continue
        checks = [
            ("ok", True, got["sd_ok"]),
            ("name", want["name"], got["sd_name"]),
            ("value", want["value"], got["sd_value"]),
            ("type", want["type"], got["sd_type"]),
            ("rate", want["rate"], got["sd_rate"]),
            ("attrs", want["attrs"], got["sd_attrs"]),
            ("addition", want["addition"], got["sd_addition"]),
        ]
        for field, w, g in checks:
            if w != g and not (
                # NaN values compare unequal to themselves
                isinstance(w, float) and isinstance(g, float)
                and w != w and g != g
            ):
                mismatches.append((ln, field, (w, g)))
    assert not mismatches, mismatches[:10]
