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


# ---------------------------------------------------------------------------
# in-engine-TRAINED quality classifier: batch-gradient logistic fit on
# Gopher-keep labels, scored with the FITTED weights. The oracle
# replays every gradient step in DuckDB CTEs (exact DECIMAL(28,9)
# gradient sums on both sides, so partial-agg order can't matter).
# ---------------------------------------------------------------------------

_CLF_ITERS = 3
_CLF_LR = 1.0


def q_quality_clf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as TX

    docs = load(spark, sf_dir, "documents")
    rules = TX.gopher_rules(F.col("text"))
    label = None
    for name, col in rules.items():
        if name.startswith("rule_"):
            label = col if label is None else (label & col)
    bias, weights = TX.quality_classifier_train(
        docs, label, lr=_CLF_LR, iters=_CLF_ITERS
    )
    return TX.quality_classifier(docs, weights=weights, bias=bias).orderBy(
        "doc_id"
    )


def _quality_clf_trained_oracle() -> str:
    from ..operators.text import STOPWORDS
    from .queries_corpus import _DUCK_TOKS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    # word-level gopher label exprs (the O_GOPHER_FILTER rule set)
    gopher_keep = (
        "(len(toks) >= 20 AND len(toks) <= 100000)"
        " AND (CASE WHEN len(toks) > 0 THEN"
        " list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks)"
        " ELSE 0.0 END BETWEEN 3.0 AND 10.0)"
        " AND (CASE WHEN len(toks) > 0 THEN"
        " len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE / len(toks)"
        " ELSE 0.0 END <= 0.1)"
        " AND (CASE WHEN len(toks) > 0 THEN"
        " len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE"
        " / len(toks) ELSE 0.0 END >= 0.80)"
        f" AND (len(list_filter(toks, t -> list_contains([{stops}], lower(t)))) >= 2)"
    )
    feat = f"""
feat AS (
  SELECT doc_id,
         CASE WHEN length(text) > 0 THEN
           length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
             / length(text) ELSE 0.0 END AS f1,
         CASE WHEN len(toks) > 0 THEN
           len(list_filter(toks, t -> lower(t) IN ({stops})))::DOUBLE
             / len(toks) ELSE 0.0 END AS f2,
         CASE WHEN len(toks) > 0 THEN
           len(list_distinct(toks))::DOUBLE / len(toks) ELSE 0.0 END AS f3,
         ln(1.0 + len(toks)) AS f4,
         CASE WHEN {gopher_keep} THEN 1.0 ELSE 0.0 END AS y
  FROM (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
)"""
    lr = _CLF_LR
    keys = ["b", "w1", "w2", "w3", "w4"]
    ctes = [feat]
    for i in range(1, _CLF_ITERS + 1):
        if i == 1:
            # zero init: z = 0, constants inline
            z = "0.0"
            cur = {k: "0.0" for k in keys}
            src = "feat"
        else:
            # previous weights arrive via the 1-row cross join; inside
            # the aggregate they must sit in an agg fn -> max()
            z = "b + w1*f1 + w2*f2 + w3*f3 + w4*f4"
            cur = {k: f"max({k})" for k in keys}
            src = f"feat CROSS JOIN i{i - 1}"
        p = f"round(1.0 / (1.0 + exp(-({z}))), 9)"
        terms = {"b": "(p - y)"}
        for j in range(1, 5):
            terms[f"w{j}"] = f"(p - y)*f{j}"
        sels = [
            f"round({cur[k]} - {lr}*(sum(CAST(round({t}, 9) AS"
            f" DECIMAL(28,9)))::DOUBLE / count(*)), 9) AS {k}"
            for k, t in terms.items()
        ]
        ctes.append(
            f"i{i} AS (SELECT {', '.join(sels)}"
            f" FROM (SELECT *, {p} AS p FROM {src}))"
        )
    zf = "b + w1*f1 + w2*f2 + w3*f3 + w4*f4"
    return f"""
WITH {','.join(ctes)}
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({zf}))), 6) AS quality_prob,
       round(1.0 / (1.0 + exp(-({zf}))), 6) >= 0.5 AS keep
FROM feat CROSS JOIN i{_CLF_ITERS}
"""


O_QUALITY_CLF_TRAINED = _quality_clf_trained_oracle()

EXT9_QUERIES["quality_clf_trained"] = q_quality_clf_trained
EXT9_ORACLES["quality_clf_trained"] = O_QUALITY_CLF_TRAINED


# ---------------------------------------------------------------------------
# streaming groupbytrace / tail sampler (buffering-window semantics:
# traces buffer in keyed state for wait_duration / decision_wait, then
# release whole — graded against the batch oracles)
# ---------------------------------------------------------------------------

def q_stream_group_by_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import stream_group_by_trace
    from .queries_streaming import (
        EVENTS_SCHEMA,
        _as_dir,
        _run_stream_until_drained,
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _as_dir(f"{sf_dir}/events.parquet")
    )
    out = stream_group_by_trace(stream, wait_ms=2_000)
    _run_stream_until_drained(out, "sgbt")
    return spark.table("sgbt")


O_STREAM_GROUP_BY_TRACE = """
SELECT user_id, count(*) AS n_events,
       md5(string_agg(event_type, '|' ORDER BY ts, event_id)) AS trace_sig
FROM events GROUP BY user_id
"""


def q_stream_tail_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import stream_tail_sampler
    from .queries_streaming import (
        EVENTS_SCHEMA,
        _as_dir,
        _run_stream_until_drained,
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(
        _as_dir(f"{sf_dir}/events.parquet")
    )
    out = stream_tail_sampler(stream, wait_ms=2_000)
    _run_stream_until_drained(out, "stail")
    return spark.table("stail")


O_STREAM_TAIL_SAMPLER = """
SELECT event_id, user_id, event_type FROM events
WHERE user_id IN (
  SELECT user_id FROM events GROUP BY user_id
  HAVING (max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
          AND max(CASE WHEN value >= 300.0 AND value <= 1e9 THEN 1 ELSE 0 END) = 1)
      OR substring(md5(CAST(user_id AS VARCHAR)), 1, 1) >= 'c'
)
"""

EXT9_QUERIES["stream_group_by_trace"] = q_stream_group_by_trace
EXT9_ORACLES["stream_group_by_trace"] = O_STREAM_GROUP_BY_TRACE
EXT9_QUERIES["stream_tail_sampler"] = q_stream_tail_sampler
EXT9_ORACLES["stream_tail_sampler"] = O_STREAM_TAIL_SAMPLER
