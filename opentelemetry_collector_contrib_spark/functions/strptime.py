"""strptime directive -> Spark datetime-pattern translation.

The reference's time parser accepts strptime layouts and converts them
to Go layouts via the directive table at
``internal/coreinternal/timeutils/internal/ctimefmt/ctimefmt.go:25-110``.
We translate the same public strptime directives to Spark/Java
DateTimeFormatter patterns so ``to_timestamp(col, fmt)`` evaluates the
parse JVM-side (no Python in the hot path).
"""

from __future__ import annotations

# strptime directive -> Spark (java.time) pattern
_DIRECTIVES: dict[str, str] = {
    "%Y": "yyyy", "%y": "yy",
    "%m": "MM", "%b": "MMM", "%B": "MMMM",
    "%d": "dd", "%e": "d", "%j": "DDD",
    "%H": "HH", "%l": "h", "%I": "hh",
    "%M": "mm", "%S": "ss",
    "%L": "SSS", "%f": "SSSSSS", "%s": "SSS",
    "%p": "a",
    "%a": "EEE", "%A": "EEEE",
    "%z": "XX", "%Z": "zzz",
    "%D": "MM/dd/yyyy", "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss", "%R": "HH:mm",
    "%n": "\n", "%t": "\t", "%%": "%",
}

# characters that must be quoted in java.time patterns
_NEED_QUOTE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'")


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
