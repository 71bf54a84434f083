"""Round-3 training-data-pipeline queries: Gopher-rules quality
filter, within-document repetition metrics, benchmark decontamination
(n-gram overlap), and the transitive near-dup dedup endpoint (keep one
doc per duplicate cluster).

These are the corpus-curation stages a 100 TB pretraining pipeline
chains after parse/route: filter -> decontaminate -> dedup. All
candidate generation is equi-join shaped; the only row-multiplying
step is shingle explosion (O(tokens), never O(pairs)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ..operators.graph import dedup_keep_representative
from .base import QueryFn, load
from .queries_corpus import _DUCK_TOKS, _duck_shingles

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS) + "]"


# ---------------------------------------------------------------------------
# Gopher-rules document filter (Rae et al. 2021 A1.1)
# ---------------------------------------------------------------------------

def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return TX.gopher_filter(docs, "doc_id", "text")


O_GOPHER_FILTER = f"""
WITH feat AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks)
              ELSE 0.0 END AS avg_raw,
         CASE WHEN len(toks) > 0
              THEN len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE / len(toks)
              ELSE 0.0 END AS symbol_raw,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE / len(toks)
              ELSE 0.0 END AS alpha_raw,
         len(list_filter(toks, t -> list_contains({_STOP_SQL}, lower(t)))) AS stopword_hits
  FROM (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
)
SELECT doc_id, n_words,
       round(avg_raw, 6) AS avg_word_len,
       round(symbol_raw, 6) AS symbol_word_ratio,
       round(alpha_raw, 6) AS alpha_word_ratio,
       stopword_hits,
       (n_words >= 20 AND n_words <= 100000) AS rule_word_count,
       (avg_raw >= 3.0 AND avg_raw <= 10.0) AS rule_avg_word_len,
       (symbol_raw <= 0.1) AS rule_symbol_ratio,
       (alpha_raw >= 0.80) AS rule_alpha_words,
       (stopword_hits >= 2) AS rule_stopwords,
       ((n_words >= 20 AND n_words <= 100000) AND (avg_raw >= 3.0 AND avg_raw <= 10.0)
        AND (symbol_raw <= 0.1) AND (alpha_raw >= 0.80) AND (stopword_hits >= 2)) AS keep
FROM feat
"""


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------

def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return TX.repetition_metrics(docs, "doc_id", "text")


def _duck_ngrams(n: int) -> str:
    """NON-distinct word n-grams (mirrors text.word_ngrams)."""
    return (
        f"list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))"
    )


O_REPETITION_METRICS = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
narrow AS (
  SELECT doc_id,
         CASE WHEN len(g2) > 0
              THEN round(1.0 - len(list_distinct(g2))::DOUBLE / len(g2), 6)
              ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN len(g3) > 0
              THEN round(1.0 - len(list_distinct(g3))::DOUBLE / len(g3), 6)
              ELSE 0.0 END AS dup_3gram_frac
  FROM (SELECT doc_id, {_duck_ngrams(2)} AS g2, {_duck_ngrams(3)} AS g3 FROM base)
),
top AS (
  SELECT doc_id, round(max(cnt)::DOUBLE / sum(cnt), 6) AS top_2gram_frac
  FROM (
    SELECT doc_id, gram, count(*) AS cnt
    FROM (SELECT doc_id, unnest({_duck_ngrams(2)}) AS gram FROM base)
    GROUP BY doc_id, gram
  )
  GROUP BY doc_id
)
SELECT narrow.doc_id, dup_2gram_frac, dup_3gram_frac,
       coalesce(top_2gram_frac, 0.0) AS top_2gram_frac
FROM narrow LEFT JOIN top USING (doc_id)
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_DECONTAM_N = 5
_DECONTAM_MOD = 97


def q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark set = every 97th doc (deterministic stand-in for an
    eval suite); corpus = the rest. Any shared distinct 5-gram marks
    the corpus doc contaminated."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _DECONTAM_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _DECONTAM_MOD != 0)
    return TX.decontam_overlap(
        corpus, bench, "doc_id", "text", shingle_n=_DECONTAM_N, min_overlap=1
    )


O_DECONTAM_OVERLAP = f"""
WITH sh AS (SELECT doc_id, {_duck_shingles(_DECONTAM_N)} AS shingles FROM documents),
bench_sh AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh
  WHERE doc_id % {_DECONTAM_MOD} = 0
),
corpus_sh AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
  WHERE doc_id % {_DECONTAM_MOD} != 0
),
hits AS (
  SELECT doc_id, count(*) AS overlap_ngrams
  FROM corpus_sh JOIN bench_sh USING (shingle)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.overlap_ngrams, 0) AS overlap_ngrams,
       coalesce(h.overlap_ngrams, 0) >= 1 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {_DECONTAM_MOD} != 0) d
LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# transitive near-dup dedup endpoint: the kept set
# ---------------------------------------------------------------------------

def q_neardup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_corpus import _MH_BANDS, _MH_K, _MH_N, _MH_T

    docs = load(spark, sf_dir, "documents")
    pairs = TX.minhash_lsh_dedup(
        docs, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, shingle_n=_MH_N,
        verify_threshold=_MH_T,
    )
    return dedup_keep_representative(docs, pairs, "doc_id").select("doc_id")


def _o_neardup_keep() -> str:
    """Extend the components oracle's recursive closure with the
    kept-set anti-join: keep docs that are their own component (or in
    no pair at all)."""
    from .queries_ext5 import O_NEARDUP_COMPONENTS

    final = "SELECT vertex, min(r) AS component FROM reach GROUP BY vertex"
    body = O_NEARDUP_COMPONENTS.strip()
    assert body.endswith(final)
    return (
        body[: -len(final)]
        + f", comp AS ({final})\n"
        + "SELECT doc_id FROM documents\n"
        + "WHERE doc_id NOT IN (SELECT vertex FROM comp WHERE vertex != component)"
    )


O_NEARDUP_KEEP = _o_neardup_keep()


EXT6_QUERIES: dict[str, QueryFn] = {
    "gopher_filter": q_gopher_filter,
    "repetition_metrics": q_repetition_metrics,
    "decontam_overlap": q_decontam_overlap,
    "neardup_keep": q_neardup_keep,
}

EXT6_ORACLES: dict[str, str] = {
    "gopher_filter": O_GOPHER_FILTER,
    "repetition_metrics": O_REPETITION_METRICS,
    "decontam_overlap": O_DECONTAM_OVERLAP,
    "neardup_keep": O_NEARDUP_KEEP,
}
