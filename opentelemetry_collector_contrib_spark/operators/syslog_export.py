"""Syslog EXPORT formatter: OTLP log records → RFC5424 / RFC3164
lines (``exporter/syslogexporter/{rfc5424,rfc3164}_formatter.go``;
the receive direction is ``operators/parse.py::syslog_parser``).

Every header part comes from the log record's ATTRIBUTES (the
exporter is the write twin of the syslog receiver, which parses into
the same attr names — sender.go:29-42): ``priority`` (default "165"),
``version`` (default "1", 5424 only), ``hostname``/``appname``/
``proc_id``/``msg_id`` (default "-"), ``message`` (default ""),
``structured_data`` (map of maps; 5424 only).

- rfc5424_formatter.go:26-43: ``<pri>ver ts host app pid msgid SD``
  + `` msg`` only when non-empty + ``\\n``; with ``octet_counting``
  the line is prefixed ``<byte-len> `` (length INCLUDES the newline)
- timestamp: Go RFC3339Nano — trailing fraction zeros trimmed, bare
  seconds when the fraction is zero, UTC ``Z`` (:53-55)
- structured data (:73-97): absent attr or non-map → ``-``; a
  present-but-EMPTY map → empty string (the builder emits nothing);
  each element renders as fmt.Sprint of [id k="v" ...] — Go iterates
  its maps in RANDOM order, this engine sorts outer ids and inner
  keys (deterministic superset of the reference's behavior);
  non-string inner values are skipped (here: model is string maps)
- rfc3164_formatter.go:19-31: ``<pri>ts host `` + ``app:`` when
  appname present + a space only when both app and message are
  non-empty + message + ``\\n``; timestamp ``Jan 02 15:04:05``
  (zero-padded day, no year)
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PRIORITY = "165"   # sender.go:19
VERSION_RFC5424 = "1"      # sender.go:20


def _jquote(c: Column) -> Column:
    """Go %q for the string-map model (JSON-style escaping)."""
    js = F.to_json(F.array(c))
    return F.substring(js, F.lit(2), F.length(js) - 2)


def _rfc3339nano(ts_ns: Column) -> Column:
    secs = (ts_ns - F.pmod(ts_ns, F.lit(1_000_000_000))).cast(
        "decimal(38,0)") / 1_000_000_000
    base = F.date_format(F.timestamp_seconds(secs.cast("bigint")),
                         "yyyy-MM-dd'T'HH:mm:ss")
    ns = F.pmod(ts_ns, F.lit(1_000_000_000))
    frac = F.when(ns > 0, F.concat(
        F.lit("."),
        F.regexp_replace(F.lpad(ns.cast("string"), 9, "0"),
                         r"0+$", ""))).otherwise(F.lit(""))
    return F.concat(base, frac, F.lit("Z"))


def syslog_export_lines(
    df: DataFrame,
    *,
    id_cols: list[str],
    protocol: str = "rfc5424",
    octet_counting: bool = False,
    ts_ns_col: str = "ts_ns",
    attrs_col: str = "attrs",
    structured_data_col: str | None = "structured_data",
) -> DataFrame:
    a = F.col(attrs_col)

    def get(key: str, dflt: str) -> Column:
        return F.coalesce(a[key], F.lit(dflt))

    pri = get("priority", DEFAULT_PRIORITY)
    host = get("hostname", "-")
    msg = get("message", "")

    if protocol == "rfc3164":
        # present-but-empty appname and absent appname coincide (the
        # Go default is "" and the colon is gated on non-empty)
        app = a["appname"]
        app_colon = F.when(F.coalesce(app, F.lit("")) != "",
                           F.concat(app, F.lit(":"))).otherwise(F.lit(""))
        delim = F.when((F.coalesce(app, F.lit("")) != "") & (msg != ""),
                       F.lit(" ")).otherwise(F.lit(""))
        ts = F.date_format(
            F.timestamp_seconds(
                ((F.col(ts_ns_col)
                  - F.pmod(F.col(ts_ns_col), F.lit(1_000_000_000)))
                 .cast("decimal(38,0)") / 1_000_000_000)
                .cast("bigint")),
            "MMM dd HH:mm:ss")
        line = F.concat(F.lit("<"), pri, F.lit(">"), ts, F.lit(" "),
                        host, F.lit(" "), app_colon, delim, msg,
                        F.lit("\n"))
    elif protocol == "rfc5424":
        ver = get("version", VERSION_RFC5424)
        app = get("appname", "-")
        pid = get("proc_id", "-")
        msgid = get("msg_id", "-")
        if structured_data_col:
            sd_col = F.col(structured_data_col)
            sd = F.when(sd_col.isNull(), F.lit("-")).otherwise(
                F.array_join(F.transform(
                    F.array_sort(F.map_keys(sd_col)),
                    lambda k: F.concat(
                        F.lit("["), k,
                        F.array_join(F.transform(
                            F.array_sort(F.map_entries(sd_col[k])),
                            lambda e: F.concat(
                                F.lit(" "), e["key"], F.lit("="),
                                _jquote(e["value"]))), ""),
                        F.lit("]"))), ""))
        else:
            sd = F.lit("-")
        msg_part = F.when(msg != "", F.concat(F.lit(" "), msg))\
            .otherwise(F.lit(""))
        line = F.concat(F.lit("<"), pri, F.lit(">"), ver, F.lit(" "),
                        _rfc3339nano(F.col(ts_ns_col)), F.lit(" "),
                        host, F.lit(" "), app, F.lit(" "), pid,
                        F.lit(" "), msgid, F.lit(" "), sd, msg_part,
                        F.lit("\n"))
        if octet_counting:
            line = F.concat(F.octet_length(line).cast("string"),
                            F.lit(" "), line)
    else:
        raise ValueError(f"unknown syslog protocol: {protocol}")

    return df.select(*id_cols, line.alias("line"))
