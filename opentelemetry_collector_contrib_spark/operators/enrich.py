"""Enrichment: broadcast lookup joins + constant stamping.

Reference semantics:
- k8sattributes processor does per-record dimension lookups with
  **insert-if-absent** — an attribute already present on the record is
  not overwritten (``processor/k8sattributesprocessor/processor.go:209-214``),
  with chained secondary lookups (pod -> namespace -> node).
- resourcedetection stamps constant resource attrs detected once at
  startup (``processor/resourcedetectionprocessor/``).
- geoip / dnslookup are the same shape against other dims.

Spark re-expression: ``join(broadcast(dim), key, "left")`` +
``coalesce(existing, dim.value)``. At 100 TB the fact side never
shuffles — the dim ships to every executor; chained lookups are
pre-joined dim-side (dims are tiny) so the fact table is touched once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    insert_if_absent: bool = True,
    prefix: str = "",
) -> DataFrame:
    """Left-broadcast-join ``dim`` onto ``fact``.

    ``insert_if_absent=True`` reproduces the k8sattributes rule: if the
    fact frame already has a column with the same name as a dim column
    and it is non-null/non-empty, keep the fact value
    (processor.go:209-214 only sets missing/empty attributes).
    """
    keys = [on] if isinstance(on, str) else list(on)
    dim_cols = [c for c in dim.columns if c not in keys]
    renamed = dim
    for c in dim_cols:
        renamed = renamed.withColumnRenamed(c, f"__dim_{c}")
    out = fact.join(F.broadcast(renamed), on=keys, how="left")
    for c in dim_cols:
        target = prefix + c
        dim_val = F.col(f"__dim_{c}")
        if target in fact.columns and insert_if_absent:
            existing = F.col(target)
            keep = existing.isNotNull() & (existing.cast("string") != "")
            out = out.withColumn(target, F.when(keep, existing).otherwise(dim_val))
        else:
            out = out.withColumn(target, dim_val)
    return out.drop(*[f"__dim_{c}" for c in dim_cols])


def stamp_constants(df: DataFrame, attrs: dict[str, object]) -> DataFrame:
    """resourcedetection analog: constant columns decided driver-side
    once (lit() folds into codegen)."""
    out = df
    for k, v in attrs.items():
        out = out.withColumn(k, F.lit(v))
    return out


def range_enrich(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str | Column,
    dim_lo: str,
    dim_hi: str,
    how: str = "left",
) -> DataFrame:
    """Range lookup (geoip CIDR-block style): fact.key BETWEEN dim.lo
    AND dim.hi, dim broadcast. For large dims, bucketize the key first
    and equi-join on bucket to keep the join from going nested-loop."""
    k = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    cond = (k >= dim[dim_lo]) & (k <= dim[dim_hi])
    return fact.join(F.broadcast(dim), on=cond, how=how)
