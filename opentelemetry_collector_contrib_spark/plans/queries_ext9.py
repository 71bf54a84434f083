"""Round-4 queries.

Similarity-search surface: true IVFADC (Jegou et al. 2011 — coarse
k-means cells + PQ asymmetric-distance scoring over only the probed
cells, replacing the flat per-query scan of ``pq_adc``).

Training surface: the in-engine-TRAINED quality classifier —
distributed batch-gradient logistic regression (the kmeans_lloyd
pattern: per-pass ``agg(sum(...))`` gradient, weights as literals per
iteration) fitted on a deterministic labeled split, scored with the
FITTED weights.

Every oracle replays the exact recursion in DuckDB CTEs (the
kmeans_ivf / pq_encode technique): same seeds, same rounding, same
tie-breaks — value-hash equality, not approximate agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load
from .queries_ext8 import _pq_block_ctes


# ---------------------------------------------------------------------------
# IVFADC: coarse cells + PQ-ADC over probed candidates only
# ---------------------------------------------------------------------------

_KC = 6
_NPROBE = 2
_NQ = 5

# DuckDB cosine between a data vector e.v / query q.qv and a centroid
# list s.c, rounded like the engine's sim_dp=12
_DCOS = (
    "round(list_dot_product({l}, s.c) / "
    "(sqrt(list_dot_product({l}, {l})) * sqrt(list_dot_product(s.c, s.c))), 12)"
)


def q_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfadc_topk

    emb = load(spark, sf_dir, "embeddings")
    return ivfadc_topk(
        emb, dim=64, m=4, ksub=4, kc=_KC, iters=2, nprobe=_NPROBE,
        n_queries=_NQ, k=1,
    ).orderBy("query_id")


def _ivfadc_oracle() -> str:
    # coarse k-means replay at full dim (the kmeans_ivf recursion):
    # seeds = vec_id < kc, one assign+update, final assign yc
    cos_e = _DCOS.format(l="e.v")
    cos_q = _DCOS.format(l="q.qv")
    coarse = f"""
ec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (SELECT CAST(vec_id AS INT) AS cell, v AS c FROM ec WHERE vec_id < {_KC}),
xc AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_e} DESC, s.cell) AS rn
    FROM ec e CROSS JOIN sc s) WHERE rn = 1
),
uc AS (
  SELECT cell, list(m ORDER BY i) AS c FROM (
    SELECT xc.cell, t.i, round(avg(e.v[CAST(t.i AS INT) + 1]), 9) AS m
    FROM xc JOIN ec e USING (vec_id) CROSS JOIN range(64) t(i)
    GROUP BY 1, 2)
  GROUP BY cell
),
yc AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_e} DESC, s.cell) AS rn
    FROM ec e CROSS JOIN uc s) WHERE rn = 1
)"""
    blocks = ",".join(_pq_block_ctes(b) for b in range(4))
    terms = " + ".join(
        f"list_dot_product(list_slice(q.qv, {b * 16 + 1}, {b * 16 + 16}), u{b}c.c)"
        for b in range(4)
    )
    joins = " ".join(f"JOIN u{b} u{b}c ON u{b}c.cell = y{b}.cell" for b in range(4))
    return f"""
WITH {coarse},
{blocks},
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {_NQ}),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, s.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_q} DESC, s.cell) AS rn
    FROM q CROSS JOIN uc s) WHERE rn <= {_NPROBE}
),
scored AS (
  SELECT q.query_id, y0.vec_id, round({terms}, 12) AS adc_score
  FROM yc JOIN y0 USING (vec_id) JOIN y1 USING (vec_id)
          JOIN y2 USING (vec_id) JOIN y3 USING (vec_id)
  {joins}
  JOIN probes q ON q.cell = yc.cell
  WHERE y0.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id, adc_score,
       CAST(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_score DESC, vec_id) AS rn
  FROM scored) WHERE rn = 1
"""


O_IVFADC = _ivfadc_oracle()


EXT9_QUERIES: dict[str, QueryFn] = {
    "ivfadc_topk": q_ivfadc,
}

EXT9_ORACLES: dict[str, str] = {
    "ivfadc_topk": O_IVFADC,
}
