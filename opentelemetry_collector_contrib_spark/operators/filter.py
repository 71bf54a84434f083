"""Filtering + sampling: filterprocessor, stanza filter, probabilistic
sampler, tail sampler (batch form).

Reference semantics:
- filterprocessor drops a record when ANY condition in the list is
  true (OR of OTTL conditions, ``processor/filterprocessor/logs.go:68-88``).
- stanza filter drops on expr match with a sampling ratio ``dropCutoff``
  in [0,1000) (``transformer/filter/transformer.go:18-55``) — the Go
  code uses rand; we must be deterministic, so ratio sampling hashes
  stable key columns.
- probabilistic sampler hashes a randomness source (trace_id or a
  configured attribute) with a seed and compares against a threshold
  (``processor/probabilisticsamplerprocessor/logsprocessor.go:124-156``).
- tail sampler buffers whole traces then applies policies
  (``processor/tailsamplingprocessor``); batch form = group-level
  policy aggregation + semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_processor(df: DataFrame, drop_conditions: list[Column]) -> DataFrame:
    """Drop where ANY condition is true; NULL condition = false
    (matches OTTL error_mode=ignore condition eval)."""
    if not drop_conditions:
        return df
    combined: Column | None = None
    for c in drop_conditions:
        c = F.coalesce(c.cast("boolean"), F.lit(False))
        combined = c if combined is None else (combined | c)
    return df.filter(~combined)


def stanza_filter(
    df: DataFrame,
    expr: Column,
    drop_ratio: float = 1.0,
    key_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Drop matching rows with probability ``drop_ratio`` —
    deterministically: pmod(xxhash64(keys, seed), 1000) < ratio*1000
    (the reference's dropCutoff scale)."""
    cutoff = int(drop_ratio * 1000)
    keys = [F.col(c) for c in (key_cols or df.columns)]
    bucket = F.pmod(F.xxhash64(*keys, F.lit(seed)), F.lit(1000))
    drop = F.coalesce(expr.cast("boolean"), F.lit(False)) & (bucket < cutoff)
    return df.filter(~drop)


def probabilistic_sampler(
    df: DataFrame,
    percent: float,
    source_col: str = "trace_id",
    seed: int = 22,
) -> DataFrame:
    """Consistent hash sampling: keep row iff
    pmod(xxhash64(source, seed), 2^14) < percent% of 2^14.

    The reference uses FNV over the randomness source with hash_seed
    (logsprocessor.go:124-156); identical keys always sample the same
    way — xxhash64 gives us the same property vectorized.
    """
    buckets = 1 << 14
    threshold = int(buckets * percent / 100.0)
    h = F.pmod(F.xxhash64(F.col(source_col), F.lit(seed)), F.lit(buckets))
    return df.filter(h < threshold).withColumn(
        "sampling_threshold", F.lit(threshold)
    )


def tail_sampler(
    df: DataFrame,
    group_col: str,
    keep_policy: Column,
) -> DataFrame:
    """Batch tail sampling: evaluate ``keep_policy`` (an aggregate
    Column, e.g. max(severity_number) >= ERROR) per group, keep whole
    groups that pass. One shuffle for the agg; the semi-join broadcasts
    when the kept-group set is small (AQE decides)."""
    keep = df.groupBy(group_col).agg(keep_policy.alias("__keep")).filter(F.col("__keep"))
    return df.join(keep.select(group_col), on=group_col, how="left_semi")
