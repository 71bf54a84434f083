"""signaltometrics connector: config-driven metrics from any signal.

Mirrors ``connector/signaltometricsconnector`` (README config surface;
config/config.go MetricInfo): each configured metric has a name, an
optional OTTL ``conditions`` list (ORed), ``attributes`` with optional
``default_value``, and exactly one metric type:

- ``sum``:    value expression summed per attribute set
- ``gauge``:  last value per attribute set (deterministic form: value
  at the max timestamp; the reference keeps the last row of the batch,
  which has no stable meaning across partitions)
- ``histogram``: explicit buckets (default bucket table from the
  README) over a value expression
- ``exponential_histogram``: base-2 buckets at a scale

Value/count/condition strings are real OTTL compiled by
``functions/ottl_compiler`` to Columns, so the whole connector is a
filter + projection + one map-side-combined groupBy per metric — the
plan a 100 TB run wants.  No state is kept across calls (the
reference aggregates per Consume* call only).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ottl_compiler import compile_condition, compile_expression
from .aggregate import explicit_histogram, exponential_histogram

# README default histogram buckets
DEFAULT_BUCKETS = [
    2.0, 4.0, 6.0, 8.0, 10.0, 50.0, 100.0, 200.0, 400.0, 800.0,
    1000.0, 1400.0, 2000.0, 5000.0, 10_000.0, 15_000.0,
]


@dataclass
class MetricInfo:
    name: str
    metric_type: str  # sum | gauge | histogram | exponential_histogram
    value: str        # OTTL value expression
    description: str = ""
    conditions: tuple[str, ...] = ()
    attributes: tuple = ()  # (key,) or (key, default_value) tuples
    buckets: list[float] = field(default_factory=lambda: list(DEFAULT_BUCKETS))
    scale: int = 0
    order_col: str = "time"  # gauge "last" tiebreak


def _prepared(df: DataFrame, cfg: MetricInfo) -> tuple[DataFrame, list[str]]:
    """Filter + attribute columns. Attribute keys are OTel-dotted
    (http.method) — grouped under sanitized internal aliases so
    groupBy never resolves a dot as a struct path; callers rename back
    via ``_renamed``."""
    if cfg.conditions:
        cond = compile_condition(cfg.conditions[0])
        for c in cfg.conditions[1:]:
            cond = cond | compile_condition(c)
        df = df.filter(cond)
    keys = []
    for i, attr in enumerate(cfg.attributes):
        key, default = attr if len(attr) == 2 else (attr[0], None)
        col = F.element_at(F.col("attributes"), F.lit(key))
        if default is not None:
            col = F.coalesce(col, F.lit(default))
        else:
            # README: no default -> signals missing the attribute are
            # not recorded for this metric
            df = df.filter(col.isNotNull())
        df = df.withColumn(f"__attr_{i}", col)
        keys.append(f"__attr_{i}")
    return df.withColumn("__value", compile_expression(cfg.value)), keys


def _renamed(out: DataFrame, cfg: MetricInfo, keys: list[str]) -> DataFrame:
    for alias, attr in zip(keys, cfg.attributes):
        out = out.withColumnRenamed(alias, attr[0])
    return out


def signal_to_metrics(df: DataFrame, cfg: MetricInfo) -> DataFrame:
    """One configured metric -> its aggregated DataFrame."""
    df, keys = _prepared(df, cfg)
    if cfg.metric_type == "sum":
        out = df.groupBy(*keys).agg(F.sum("__value").alias(cfg.name))
    elif cfg.metric_type == "gauge":
        out = df.groupBy(*keys).agg(
            F.max_by("__value", F.col(cfg.order_col)).alias(cfg.name)
        )
    elif cfg.metric_type == "histogram":
        out = explicit_histogram(df, "__value", cfg.buckets, keys)
    elif cfg.metric_type == "exponential_histogram":
        out = exponential_histogram(df, "__value", keys, scale=cfg.scale)
    else:
        raise ValueError(f"unknown metric type {cfg.metric_type!r}")
    return _renamed(out, cfg, keys)
