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

from opentelemetry_collector_contrib_spark.operators.receivers import statsd_parse

_TYPES = ["c", "g", "h", "ms", "d", "q", "", "cc"]


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
                rate = float(part[1:])
            except ValueError:
                return None
        elif part.startswith("#"):
            tags = part[1:]
            if tags != "":
                for tag in tags.split(","):
                    if tag == "":
                        continue
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
        value = float(value_str)
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
        val = rng.choice(["5", "3.25", "", "1e2", "abc", "0.5", "1e300"])
        typ = rng.choice(_TYPES)
        parts = [f"{name}:{sign}{val}", typ]
        for _ in range(rng.randint(0, 3)):
            kind = rng.random()
            if kind < 0.3:
                parts.append("@" + rng.choice(["0.5", "2", "0.25", "x", ""]))
            elif kind < 0.6:
                parts.append(
                    "#" + rng.choice(
                        ["env:prod", "a:1,b:2", "bare", ":v", "k:", "",
                         "a:1,,b:2"]
                    )
                )
            elif kind < 0.8:
                parts.append("c:" + rng.choice(["abc", ""]))
            else:
                parts.append("T" + rng.choice(
                    ["1700000000", "12x", "", "99999999999999999999"]))
        lines.append("|".join(parts))
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
            if w != g:
                mismatches.append((ln, field, (w, g)))
    assert not mismatches, mismatches[:10]
