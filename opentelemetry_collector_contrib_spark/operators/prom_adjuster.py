"""prometheusreceiver initial-point adjuster → window operator.

Re-expresses ``receiver/prometheusreceiver/internal/
metrics_adjuster.go`` (initialPointAdjuster) over a flat series table
instead of the per-(job, instance) in-memory timeseriesMap: every
cumulative point's start timestamp is rewritten to the start of its
RESET SEGMENT — the run of points since the last counter reset.

Faithful per-point semantics (:255-420, per series ordered by scrape
time):

- the first point initializes state and keeps its own start (and its
  value initializes ``previous`` EVEN IF the point is stale — the
  found-check precedes the stale-check);
- a stale point (NoRecordedValue) inherits the current segment start
  and does NOT update ``previous``;
- a reset — family-specific: sum → value < previous; histogram /
  exponential histogram → count < prevCount OR sum < prevSum;
  summary → the ZERO-GUARDED pair (count≠0 ∧ prevCount≠0 ∧
  count<prevCount) ∨ (sum≠0 ∧ prevSum≠0 ∧ sum<prevSum) — starts a
  new segment anchored at the point's own start timestamp (or at the
  point's TIME when ``use_point_time_for_reset``);
- with ``use_created_metric``, a non-stale point whose start already
  precedes its time (set from _created) is passed through untouched
  and is INVISIBLE to the state — it neither updates ``previous``
  nor joins a segment (the early ``continue`` before ``tsm.get``).

Plan: ONE shuffle on the series key; segment ids are a running sum
of reset boundaries; the segment start is a ``first`` over the
(series, segment) window. The reference's JobsMap + GC is replaced
by the partition key — nothing to garbage-collect in batch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def prom_adjust_start_times(
    df: DataFrame,
    series_cols: list[str],
    family: str = "sum",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    stale_col: str = "stale",
    use_created_metric: bool = False,
    use_point_time_for_reset: bool = False,
) -> DataFrame:
    """Returns the input plus ``start_adjusted``.

    family='sum' uses column ``value``; 'histogram' uses ``count`` and
    ``sum``; 'summary' adds the zero guards on the same columns.
    """
    ts, start = F.col(ts_col), F.col(start_col)
    stale = F.coalesce(F.col(stale_col), F.lit(False))

    excluded = F.lit(False)
    if use_created_metric:
        excluded = (~stale) & (start < ts)
    df = df.withColumn("_excluded", excluded)
    inc = df.where(~F.col("_excluded"))
    exc = df.where(F.col("_excluded")) \
            .withColumn("start_adjusted", start)

    w = W.partitionBy(*series_cols).orderBy(ts)
    wprev = w.rowsBetween(W.unboundedPreceding, -1)

    # stage 1: mark first rows and the values that feed `previous`
    # (window results can't nest inside another window's argument)
    vcols = {"sum": ["value"],
             "histogram": ["count", "sum"],
             "exponential_histogram": ["count", "sum"],
             "summary": ["count", "sum"]}.get(family)
    if vcols is None:
        raise ValueError(f"unknown family: {family}")
    inc = inc.select(
        "*", (F.row_number().over(w) == 1).alias("_first"))
    inc = inc.select(
        "*", *[F.when(F.col("_first") | ~stale, F.col(c))
               .alias(f"_c_{c}") for c in vcols])
    inc = inc.select(
        "*", *[F.last(f"_c_{c}", ignorenulls=True).over(wprev)
               .alias(f"_p_{c}") for c in vcols])

    first = F.col("_first")
    if family == "sum":
        reset = F.col("value") < F.col("_p_value")
    elif family in ("histogram", "exponential_histogram"):
        reset = ((F.col("count") < F.col("_p_count"))
                 | (F.col("sum") < F.col("_p_sum")))
    else:  # summary
        c, s = F.col("count"), F.col("sum")
        pc, ps = F.col("_p_count"), F.col("_p_sum")
        reset = (((c != 0) & (pc != 0) & (c < pc))
                 | ((s != 0) & (ps != 0) & (s < ps)))
    reset = (~stale) & (~first) & F.coalesce(reset, F.lit(False))

    boundary = first | reset
    inc = inc.select(
        "*", boundary.cast("int").alias("_b"),
        (F.when(reset & F.lit(use_point_time_for_reset), ts)
         .otherwise(start)).alias("_eff_start"))
    seg = F.sum("_b").over(
        W.partitionBy(*series_cols).orderBy(ts)
        .rowsBetween(W.unboundedPreceding, 0))
    inc = inc.withColumn("_seg", seg)
    wseg = W.partitionBy(*series_cols, "_seg").orderBy(ts)
    inc = inc.withColumn(
        "start_adjusted",
        F.first("_eff_start").over(wseg)).drop(
        "_b", "_eff_start", "_seg", "_first",
        *[f"_c_{c}" for c in vcols], *[f"_p_{c}" for c in vcols])
    return inc.unionByName(exc).drop("_excluded")
