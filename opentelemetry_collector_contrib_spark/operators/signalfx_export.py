"""SignalFx EXPORT translator: OTLP metrics → SignalFx proto datapoints
(``pkg/translator/signalfx/from_metrics.go``; the receive direction is
``operators/signalfx.py``).

Input is the row-per-datapoint OTLP form (metric metadata repeated per
point); output is one row per SignalFx datapoint. Vectorized Column
algebra, per rule:

- metric type ladder            — from_metrics.go:85-115
  (gauge → GAUGE; sum: non-monotonic → GAUGE, delta → COUNTER, else
  CUMULATIVE_COUNTER; histogram: delta → COUNTER else
  CUMULATIVE_COUNTER; summary/exp-histogram/empty → nil)
- number points                 — :118-137 (the point is emitted even
  when the value type is EMPTY — both value fields stay unset; int
  wins by value type, not presence)
- histograms                    — :139-225 (gated on
  ``process_histograms``; `_count` always, `_sum`/`_min`/`_max` only
  when present — min/max are ALWAYS gauges; buckets skipped when
  ``drop_histogram_buckets``, when counts is empty, or when
  len(counts) != len(bounds)+1; bucket values are the RUNNING sum and
  carry an extra ``le`` dim — bound rendered like Prometheus
  (float64ToDimValue :299-318: 0 → "0", 1 → "1", +Inf → "+Inf", else
  shortest decimal), last bucket +Inf)
- summaries                     — :227-275 (`_count`/`_sum` are
  CUMULATIVE_COUNTER — sum emitted even when absent, pdata defaults
  it to 0 — and each quantile a GAUGE with a ``quantile`` dim,
  FormatFloat 'f')
- dimensions                    — :277-297 (resource attrs first,
  then point attrs, values AsString; rendered here as a SORTED k=v
  CSV because the proto dimension list is an unordered bag)
- timestamps                    — timestamp.go:10-13 (ns → ms)

Known rendering divergence (documented, not exercised): Go's
``strconv.FormatFloat(f,'g',-1,64)`` uses exponent notation outside
[1e-4, 1e21) where Spark's double cast renders ``1.0E21`` — bucket
bounds in that range keep Spark's spelling.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GAUGE = "GAUGE"
COUNTER = "COUNTER"
CUMULATIVE = "CUMULATIVE_COUNTER"

_PT_T = ("struct<metric:string,mt:string,vint:bigint,vdouble:double,"
         "extra:string>")
_EMPTY_PTS = f"array<{_PT_T}>"


def _fmt_num(c: Column) -> Column:
    """float64ToDimValue / FormatFloat-'f' for the fixture range."""
    return (F.when(c == float("inf"), F.lit("+Inf"))
            .when(c == 0, F.lit("0"))
            .when(c == 1, F.lit("1"))
            .otherwise(F.regexp_replace(c.cast("string"),
                                        r"\.0$", "")))


def _pt(metric: Column, mt: Column, vint: Column, vdouble: Column,
        extra: Column) -> Column:
    return F.struct(metric.alias("metric"), mt.alias("mt"),
                    vint.cast("bigint").alias("vint"),
                    vdouble.cast("double").alias("vdouble"),
                    extra.cast("string").alias("extra"))


def _maybe(cond: Column, pt: Column) -> Column:
    return F.when(cond, F.array(pt)).otherwise(
        F.expr("array()").cast(_EMPTY_PTS))


def signalfx_from_metrics(
    df: DataFrame,
    *,
    id_cols: list[str],
    drop_histogram_buckets: bool = False,
    process_histograms: bool = True,
    name_col: str = "name",
    mtype_col: str = "mtype",
    monotonic_col: str = "monotonic",
    delta_col: str = "delta",
    ts_ns_col: str = "ts_ns",
    attrs_col: str = "attrs",
    res_attrs_col: str = "res_attrs",
    is_int_col: str = "is_int",
    vint_col: str = "vint",
    vdouble_col: str = "vdouble",
    count_col: str = "count",
    sum_col: str = "sum",
    min_col: str = "min",
    max_col: str = "max",
    bounds_col: str = "bounds",
    bucket_counts_col: str = "bucket_counts",
    quantiles_col: str = "quantiles",
) -> DataFrame:
    name = F.col(name_col)
    mtype = F.col(mtype_col)
    delta = F.coalesce(F.col(delta_col), F.lit(False))
    nil_i = F.lit(None).cast("bigint")
    nil_d = F.lit(None).cast("double")
    nil_s = F.lit(None).cast("string")

    # fromMetricTypeToMetricType (:85-115)
    hist_mt = F.when(delta, F.lit(COUNTER)).otherwise(F.lit(CUMULATIVE))
    mt = (F.when(mtype == "gauge", F.lit(GAUGE))
          .when(mtype == "sum",
                F.when(~F.coalesce(F.col(monotonic_col), F.lit(False)),
                       F.lit(GAUGE)).otherwise(hist_mt))
          .when(mtype == "histogram", hist_mt)
          .otherwise(nil_s))

    # number points (:118-137) — emitted even with an EMPTY value
    is_int = F.col(is_int_col)
    number_pts = _maybe(
        mtype.isin("gauge", "sum"),
        _pt(name, mt,
            F.when(is_int, F.col(vint_col)),
            F.when(~is_int, F.col(vdouble_col)), nil_s))

    # histogram fan (:139-225)
    counts = F.coalesce(F.col(bucket_counts_col),
                        F.expr("array()").cast("array<bigint>"))
    bounds = F.coalesce(F.col(bounds_col),
                        F.expr("array()").cast("array<double>"))
    buckets_ok = ((F.size(counts) > 0)
                  & (F.size(counts) == F.size(bounds) + 1))
    bucket_pts = F.transform(
        counts,
        lambda c, j: _pt(
            F.concat(name, F.lit("_bucket")), mt,
            F.aggregate(F.slice(counts, F.lit(1), j + 1),
                        F.lit(0).cast("bigint"), lambda a, x: a + x),
            nil_d,
            F.concat(F.lit("le="),
                     F.when(j < F.size(bounds),
                            _fmt_num(F.element_at(bounds, j + 1)))
                     .otherwise(F.lit("+Inf")))))
    hist = mtype == "histogram"
    hist_pts = F.concat(
        _maybe(hist, _pt(F.concat(name, F.lit("_count")), mt,
                         F.col(count_col), nil_d, nil_s)),
        _maybe(hist & F.col(sum_col).isNotNull(),
               _pt(F.concat(name, F.lit("_sum")), mt, nil_i,
                   F.col(sum_col), nil_s)),
        _maybe(hist & F.col(min_col).isNotNull(),
               _pt(F.concat(name, F.lit("_min")), F.lit(GAUGE), nil_i,
                   F.col(min_col), nil_s)),
        _maybe(hist & F.col(max_col).isNotNull(),
               _pt(F.concat(name, F.lit("_max")), F.lit(GAUGE), nil_i,
                   F.col(max_col), nil_s)),
        (F.when(hist & buckets_ok, bucket_pts)
         .otherwise(F.expr("array()").cast(_EMPTY_PTS)))
        if not drop_histogram_buckets
        else F.expr("array()").cast(_EMPTY_PTS),
    ) if process_histograms else F.expr("array()").cast(_EMPTY_PTS)

    # summary fan (:227-275)
    summ = mtype == "summary"
    summary_pts = F.concat(
        _maybe(summ, _pt(F.concat(name, F.lit("_count")),
                         F.lit(CUMULATIVE), F.col(count_col), nil_d,
                         nil_s)),
        _maybe(summ, _pt(F.concat(name, F.lit("_sum")),
                         F.lit(CUMULATIVE), nil_i,
                         F.coalesce(F.col(sum_col), F.lit(0.0)), nil_s)),
        F.when(summ, F.transform(
            F.coalesce(F.col(quantiles_col), F.expr("array()").cast(
                "array<struct<q:double,v:double>>")),
            lambda qv: _pt(F.concat(name, F.lit("_quantile")),
                           F.lit(GAUGE), nil_i, qv["v"],
                           F.concat(F.lit("quantile="),
                                    _fmt_num(qv["q"])))))
        .otherwise(F.expr("array()").cast(_EMPTY_PTS)),
    )

    def kv(m: Column) -> Column:
        return F.transform(
            F.map_entries(F.coalesce(
                m, F.expr("map()").cast("map<string,string>"))),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]))

    base_dims = F.concat(kv(F.col(res_attrs_col)), kv(F.col(attrs_col)))

    out = df.select(
        *id_cols,
        # integral div — double division loses ULPs at ~1.7e18 ns
        F.expr(f"CAST({ts_ns_col} AS BIGINT) div 1000000")
        .alias("ts_ms"),
        base_dims.alias("_dims"),
        F.explode(F.concat(number_pts, hist_pts, summary_pts))
        .alias("_pt"),
    )
    p = F.col("_pt")
    return out.select(
        *id_cols,
        p["metric"].alias("metric"),
        p["mt"].alias("metric_type"),
        F.col("ts_ms"),
        F.array_join(F.array_sort(F.concat(
            F.col("_dims"),
            F.when(p["extra"].isNotNull(), F.array(p["extra"]))
            .otherwise(F.expr("array()").cast("array<string>")))), ",")
        .alias("dims"),
        p["vint"].alias("vint"),
        p["vdouble"].alias("vdouble"),
    )
