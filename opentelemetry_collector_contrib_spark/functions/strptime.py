"""strptime directive -> Spark datetime-pattern translation.

The reference's time parser accepts strptime layouts and converts them
to Go layouts via the directive table at
``internal/coreinternal/timeutils/internal/ctimefmt/ctimefmt.go:25-66``
(``ctimeSubstitutes``). We translate the same public strptime
directives 1:1 to Spark/Java DateTimeFormatter patterns so
``to_timestamp(col, fmt)`` evaluates the parse JVM-side (no Python in
the hot path).

Documented deltas vs Go (precision/padding, not semantics):
- ``%s`` is Go's 9-digit fractional *nanoseconds* (``"999999999"``);
  Spark timestamps are µs so the last 3 digits are truncated on parse.
- ``%o``/``%e`` are Go space-padded month/day (``"_1"``/``"_2"``);
  Java has no space-padded numeric field — we map to the unpadded
  form, which parses both padded and unpadded digits (Spark parses
  case-insensitively and leniently on width for single-letter fields)
  but formats without the leading space.
- ``%P`` (lowercase am/pm) parses fine (Spark parsing is
  case-insensitive) but formats as uppercase ``PM``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime directive -> Spark (java.time) pattern, pinned 1:1 to the
# reference's ctimeSubstitutes (ctimefmt.go:25-66)
_DIRECTIVES: dict[str, str] = {
    "%Y": "yyyy", "%y": "yy",
    "%m": "MM", "%o": "M", "%q": "M",
    "%b": "MMM", "%h": "MMM", "%B": "MMMM",
    "%d": "dd", "%e": "d", "%g": "d",
    "%a": "EEE", "%A": "EEEE",
    "%H": "HH", "%l": "h", "%I": "hh",
    "%p": "a", "%P": "a",
    "%M": "mm", "%S": "ss",
    "%L": "SSS", "%f": "SSSSSS", "%s": "SSSSSSSSS",
    "%Z": "zzz",
    # Go offset layouts: Z0700 / -070000 / -07 / -07:00 / -07:00:00
    "%z": "XX", "%w": "xxxx", "%i": "x", "%j": "xxx", "%k": "xxxxx",
    "%D": "MM/dd/yyyy", "%x": "MM/dd/yyyy",
    "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss", "%X": "HH:mm:ss",
    "%r": "hh:mm:ss a", "%R": "HH:mm",
    "%c": "EEE MMM dd HH:mm:ss yyyy",
    "%n": "\n", "%t": "\t", "%%": "%",
}

# characters that must be quoted in java.time patterns
_NEED_QUOTE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'")


_DAY_NAME_RE = (
    r"(?i)(Mon(day)?|Tue(sday)?|Wed(nesday)?|Thu(rsday)?|Fri(day)?|"
    r"Sat(urday)?|Sun(day)?)"
)


def strptime_parse(col: Column, layout: str) -> Column:
    """``to_timestamp`` for a strptime layout, handling day-of-week.

    Spark >= 3 rejects ``EEE`` in PARSE patterns (day-of-week fields
    are format-only, DATETIME_PATTERN_RECOGNITION). Day-of-week never
    determines the instant, so for layouts containing %a/%A/%c the day
    name is stripped from both the layout and the input string before
    parsing — same instant, Go-compatible acceptance."""
    if any(d in layout for d in ("%a", "%A", "%c")):
        layout = layout.replace("%c", "%a %b %d %H:%M:%S %Y")
        layout = re.sub(r"%[aA][,\s]*", "", layout)
        col = F.regexp_replace(col, _DAY_NAME_RE + r"[,\s]*", "")
    return F.to_timestamp(col, strptime_to_spark(layout))


def strptime_to_spark(fmt: str) -> str:
    """Translate a strptime layout to a Spark datetime pattern.

    Literal letters in the input are single-quoted so java.time does
    not interpret them (e.g. the ``T`` and ``Z`` in ISO-8601 layouts).
    """
    out: list[str] = []
    i = 0
    n = len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "%" and i + 1 < n:
            directive = fmt[i : i + 2]
            if directive in _DIRECTIVES:
                out.append(_DIRECTIVES[directive])
                i += 2
                continue
            raise ValueError(f"unsupported strptime directive {directive!r} in {fmt!r}")
        if ch in _NEED_QUOTE:
            # group consecutive literal letters into one quoted run
            j = i
            while j < n and fmt[j] in _NEED_QUOTE and fmt[j] != "%":
                j += 1
            run = fmt[i:j].replace("'", "''")
            out.append(f"'{run}'")
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)
