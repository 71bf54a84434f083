"""Round-3 batch B queries.

Pipeline surface: the OTTL profile context, input-encoding decode
(filelog `encoding` config), and the stateful streaming recombine as
a graded query (`stream_recombine` runs REAL Structured Streaming —
applyInPandasWithState + availableNow + memory sink — and its batch
SQL oracle reconstructs the same session segmentation with window
functions).

Training-data surface: corpus-wide PII scrubbing, TF-IDF top-k
keywords, stratified mixing sample, sequence packing, C4 line
filtering, deterministic corpus shuffle, and in-engine IVF codebook
training (Lloyd k-means whose DuckDB oracle replays the identical
seed->assign->mean->re-assign recursion).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import QueryFn, load
from .queries_streaming import _run_stream, _run_stream_until_drained


# ---------------------------------------------------------------------------
# OTTL profile context (pkg/ottl/contexts/ottlprofile/profile.go path
# registry; README path table). Flat profile model: profile_id hex
# string, time_unix_nano/duration_unix_nano longs, period long,
# original_payload_format string, attributes map.
# ---------------------------------------------------------------------------

def q_ottl_profile_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile.* statements through the statement compiler: the
    profile_id.string identity read, a duration-gated format stamp,
    OTTL integer division on period, and an attributes-keyed where —
    the shapes a transformprocessor profiles config uses."""
    from ..functions.ottl_compiler import compile_statements, infer_context

    ev = load(spark, sf_dir, "events")
    profiles = ev.select(
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("profile_id"),
        F.floor(F.col("value") * 1e6).cast("long").alias("duration_unix_nano"),
        F.lit(1_000_000_000).cast("long").alias("period"),
        F.lit("").alias("original_payload_format"),
        F.create_map(F.lit("etype"), F.col("event_type")).alias("attributes"),
    )
    stmts = [
        'set(profile.attributes["pid"], profile.profile_id.string)',
        'set(profile.original_payload_format, "pprof") '
        "where profile.duration_unix_nano > 50000000",
        "set(profile.period, profile.period / 2) "
        'where profile.attributes["etype"] == "click"',
    ]
    assert infer_context(stmts) == "profile"
    out = compile_statements(stmts)(profiles)
    return out.select(
        "event_id",
        F.element_at("attributes", F.lit("pid")).alias("pid"),
        "original_payload_format",
        "period",
        "duration_unix_nano",
    )


O_OTTL_PROFILE_CONTEXT = """
SELECT event_id,
       md5(CAST(event_id AS VARCHAR)) AS pid,
       CASE WHEN CAST(floor(value * 1e6) AS BIGINT) > 50000000
            THEN 'pprof' ELSE '' END AS original_payload_format,
       CASE WHEN event_type = 'click' THEN 500000000
            ELSE 1000000000 END AS period,
       CAST(floor(value * 1e6) AS BIGINT) AS duration_unix_nano
FROM events
"""


# ---------------------------------------------------------------------------
# input encoding decode (fileconsumer/config.go `encoding`,
# textutils/encoding.go LookupEncoding): UTF-16LE through the JVM
# codegen path, an IANA codec (Big5) through the Arrow pandas path.
# The query round-trips event_type through encode->decode so the
# oracle is exact equality with the original strings.
# ---------------------------------------------------------------------------

def q_decode_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.parse import decode_input

    ev = load(spark, sf_dir, "events")
    raw = ev.select(
        "event_id",
        F.encode(F.col("event_type"), "UTF-16LE").alias("raw16"),
        # Big5 is ASCII-transparent, so UTF-8 bytes of ASCII text ARE
        # valid Big5 bytes — exercises the codec path losslessly
        F.encode(F.col("event_type"), "UTF-8").alias("rawb5"),
    )
    out = decode_input(raw, source="raw16", target="body_utf16",
                       encoding="utf-16le")
    out = decode_input(out, source="rawb5", target="body_big5",
                       encoding="big5")
    return out.select("event_id", "body_utf16", "body_big5")


O_DECODE_INPUT = """
SELECT event_id, event_type AS body_utf16, event_type AS body_big5
FROM events
"""


# ---------------------------------------------------------------------------
# streaming recombine as a graded query
# (pkg/stanza/operator/transformer/recombine/transformer.go state
# machine; force_flush_timeout set beyond the run so only CLOSED
# sessions emit — the deterministic contract a batch oracle can check)
# ---------------------------------------------------------------------------

def q_stream_recombine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import stream_recombine

    ev = load(spark, sf_dir, "events")
    turns = ev.select(
        (F.col("user_id") % 50).cast("string").alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.col("event_type").alias("text"),
        (F.col("event_id") % 7 == 0).alias("is_first"),
    )
    feed = tempfile.mkdtemp(prefix="recombine-feed-")
    turns.write.mode("overwrite").parquet(feed)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx bigint, text string, is_first boolean"
    ).parquet(feed)
    # force_flush_timeout = 30 s: long enough that no session flushes
    # open BETWEEN data micro-batches (availableNow drains the feed in
    # seconds), short enough that the post-data state-cleanup loop
    # ("no new data but cleaning up state") evicts and terminates
    # promptly. A far-future timeout makes availableNow spin empty
    # cleanup batches until it EXPIRES — measured 300+ s of idle
    # batches with the previous 1-hour setting. Open sessions emit
    # closed=false and are filtered below, so the graded rows are
    # identical either way.
    out = stream_recombine(stream, timeout_ms=30_000)
    _run_stream_until_drained(out, "srec")
    return (
        spark.table("srec")
        .filter(F.col("closed"))
        .select("conv_id", "session_start", "text", "n_turns")
    )


O_STREAM_RECOMBINE = """
WITH t AS (
  SELECT CAST(user_id % 50 AS VARCHAR) AS conv_id,
         event_id AS turn_idx, event_type AS text,
         CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS isf
  FROM events
), s AS (
  SELECT *, sum(isf) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS sid
  FROM t
), g AS (
  SELECT conv_id, sid,
         min(turn_idx) AS session_start,
         string_agg(text, chr(10) ORDER BY turn_idx) AS text,
         CAST(count(*) AS INT) AS n_turns
  FROM s GROUP BY conv_id, sid
)
SELECT conv_id, session_start, text, n_turns
FROM (SELECT *, max(sid) OVER (PARTITION BY conv_id) AS mx FROM g)
WHERE sid < mx
"""


# ---------------------------------------------------------------------------
# corpus PII scrubbing (redactionprocessor blocked_values corpus-wide;
# deterministic PII seeded into the synthetic docs so the masking is
# observable)
# ---------------------------------------------------------------------------

def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pii_scrub

    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.2."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-6789 tel 555-867-5309"
                  " card 4111 1111 1111 1111"),
        ).alias("text"),
    )
    return pii_scrub(seeded, "text").select("doc_id", "text")


O_PII_SCRUB = """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com ip 10.2.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.7 ssn 123-45-6789 tel 555-867-5309 card 4111 1111 1111 1111',
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b', '<CC>', 'g'),
        '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
      '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS text
FROM documents
"""


# ---------------------------------------------------------------------------
# TF-IDF top-k keywords (corpus analysis; linear idf = N/df so scores
# are exact rationals — see operators/text.py tf_idf_topk)
# ---------------------------------------------------------------------------

def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tf_idf_topk

    docs = load(spark, sf_dir, "documents")
    return tf_idf_topk(docs, "doc_id", "text", k=3)


O_TF_IDF = """
WITH toks AS (
  SELECT doc_id, lower(t.term) AS term
  FROM documents,
       unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                          x -> x != '')) AS t(term)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS dfreq FROM tf GROUP BY 1
), nd AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.dfreq,
         tf.tf * (CAST(n_docs AS DOUBLE) / CAST(dfreq AS DOUBLE)) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, dfreq, tfidf, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# stratified corpus sampling (per-lang keep rates, md5-consistent)
# ---------------------------------------------------------------------------

_STRATA_RATES = {"en": 0.5, "de": 1.0, "zh": 0.25, "fr": 0.75}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import stratified_sample

    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "lang", _STRATA_RATES,
                             id_col="doc_id", default_rate=0.125)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
    ).orderBy("lang")


O_STRATIFIED_SAMPLE = """
WITH cut AS (
  SELECT *, CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN 'g'
                      WHEN 'zh' THEN '4000' WHEN 'fr' THEN 'c000'
                      ELSE '2000' END AS cutoff
  FROM documents
)
SELECT lang, count(*) AS n_kept, min(doc_id) AS min_doc
FROM cut
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < cutoff
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk into 512-token bins, 8 shards)
# ---------------------------------------------------------------------------

def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512, shards=8)


O_PACK_SEQUENCES = """
WITH base AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '')) AS n_tokens
  FROM documents
), packed AS (
  SELECT *, CAST(floor((sum(n_tokens) OVER (PARTITION BY shard
                        ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        - n_tokens) / 512.0) AS BIGINT) AS bin
  FROM base
)
SELECT shard, bin, count(*) AS n_docs, sum(n_tokens) AS bin_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# C4-style line filtering (Raffel et al. 2020 public heuristics).
# The synthetic docs are single-line, so the query seeds a
# deterministic multi-line wrapper: the doc text as a proper sentence,
# plus known-junk lines (code brace, javascript nav, lorem ipsum,
# too-short) the filter must strip.
# ---------------------------------------------------------------------------

def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import c4_line_filter

    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(".")),
            F.lit("function() { return 0; }"),
            F.lit("Enable JavaScript to view this page."),
            F.lit("Lorem ipsum dolor sit amet, consectetur adipiscing elit."),
            F.lit("Too short."),
            F.lit("This closing line is a real sentence with many words."),
        ).alias("text"),
    )
    out = c4_line_filter(seeded, "text", min_words=3, min_kept_lines=2)
    return out.select("doc_id", "n_lines", "n_kept_lines", "clean_text", "c4_keep")


O_C4_LINE_FILTER = """
WITH seeded AS (
  SELECT doc_id,
         [text || '.',
          'function() { return 0; }',
          'Enable JavaScript to view this page.',
          'Lorem ipsum dolor sit amet, consectetur adipiscing elit.',
          'Too short.',
          'This closing line is a real sentence with many words.'] AS lines
  FROM documents
), f AS (
  SELECT doc_id, len(lines) AS n_lines,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?"]\\s*$')
           AND len(list_filter(string_split_regex(trim(l), '\\s+'),
                               t -> t != '')) >= 3
           AND NOT contains(lower(l), '{')
           AND NOT contains(lower(l), '}')
           AND NOT contains(lower(l), 'javascript')
           AND NOT contains(lower(l), 'lorem ipsum')) AS kept
  FROM seeded
)
SELECT doc_id, n_lines, len(kept) AS n_kept_lines,
       list_aggregate(kept, 'string_agg', chr(10)) AS clean_text,
       len(kept) >= 2 AS c4_keep
FROM f
"""


# ---------------------------------------------------------------------------
# deterministic corpus shuffle (training-order assignment, seeded
# md5 sort key, hex-prefix shards)
# ---------------------------------------------------------------------------

def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import corpus_shuffle

    docs = load(spark, sf_dir, "documents")
    return corpus_shuffle(docs, seed="epoch7").select(
        "doc_id", "shuffle_shard", "shuffle_rank"
    )


O_CORPUS_SHUFFLE = """
SELECT doc_id, substring(k, 1, 1) AS shuffle_shard,
       CAST(row_number() OVER (PARTITION BY substring(k, 1, 1)
                               ORDER BY k, doc_id) AS INT) AS shuffle_rank
FROM (SELECT doc_id, md5('epoch7' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents)
"""


# ---------------------------------------------------------------------------
# in-engine IVF codebook training: 2 Lloyd iterations of spherical
# k-means (k=6) over the embeddings table; the oracle replays the
# identical recursion in SQL (seed cells -> assign -> mean-update ->
# re-assign), with sims rounded 12dp and centroid components 9dp so
# both engines walk the same lattice.
# ---------------------------------------------------------------------------

def q_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_lloyd

    emb = load(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_lloyd(emb, k=6, iters=2)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )


_DUCK_KM_COS = (
    "round(list_dot_product(e.v, s.c) / "
    "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.c, s.c))), 12)"
)

O_KMEANS_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (SELECT CAST(vec_id AS INT) AS cell, v AS c FROM e WHERE vec_id < 6),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_KM_COS} DESC, s.cell) AS rn
    FROM e CROSS JOIN seeds s) WHERE rn = 1
),
upd AS (
  SELECT cell, list(m ORDER BY i) AS c FROM (
    SELECT a1.cell, t.i, round(avg(e.v[CAST(t.i AS INT) + 1]), 9) AS m
    FROM a1 JOIN e USING (vec_id) CROSS JOIN range(64) t(i)
    GROUP BY 1, 2)
  GROUP BY cell
),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DUCK_KM_COS} DESC, s.cell) AS rn
    FROM e CROSS JOIN upd s) WHERE rn = 1
)
SELECT cell, count(*) AS n_vecs, min(vec_id) AS min_vec, max(vec_id) AS max_vec
FROM a2 GROUP BY cell
"""


# ---------------------------------------------------------------------------
# cross-document line dedup (CCNet-style boilerplate removal). Seeds a
# shared boilerplate header/footer into every doc plus a per-doc
# unique line; the op must strip exactly the shared lines everywhere.
# ---------------------------------------------------------------------------

def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import line_dedup

    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("COPYRIGHT 2026 Example Corp. All rights reserved."),
            F.col("text"),
            F.concat(F.lit("unique line for doc "), F.col("doc_id").cast("string")),
            F.lit("Subscribe to our newsletter!"),
        ).alias("text"),
    )
    return line_dedup(seeded, max_docs=1).select(
        "doc_id", "n_lines", "n_kept_lines", "clean_text"
    )


O_LINE_DEDUP = """
WITH seeded AS (
  SELECT doc_id,
         ['COPYRIGHT 2026 Example Corp. All rights reserved.',
          text,
          'unique line for doc ' || CAST(doc_id AS VARCHAR),
          'Subscribe to our newsletter!'] AS lines
  FROM documents
), lns AS (
  SELECT doc_id, CAST(t.i AS INT) AS pos, lines[CAST(t.i AS INT) + 1] AS line
  FROM seeded CROSS JOIN range(4) t(i)
  WHERE trim(lines[CAST(t.i AS INT) + 1]) != ''
), freq AS (
  SELECT trim(line) AS k, count(DISTINCT doc_id) AS line_df
  FROM lns GROUP BY 1
), kept AS (
  SELECT lns.* FROM lns JOIN freq ON trim(lns.line) = freq.k
  WHERE line_df <= 1
)
SELECT s.doc_id,
       (SELECT CAST(count(*) AS INT) FROM lns WHERE lns.doc_id = s.doc_id) AS n_lines,
       coalesce(k.n_kept_lines, 0) AS n_kept_lines,
       coalesce(k.clean_text, '') AS clean_text
FROM seeded s LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         CAST(count(*) AS INT) AS n_kept_lines
  FROM kept GROUP BY doc_id
) k USING (doc_id)
"""


# ---------------------------------------------------------------------------
# turn-context windows + SFT pair extraction (transcript ops: the
# step between curation and training-data emission). Events stand in
# for turns: conv = user_id%40, role cycles user/assistant/tool by
# event_type.
# ---------------------------------------------------------------------------

def _turns_from_events(ev):
    return ev.select(
        (F.col("user_id") % 40).cast("string").alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.when(F.col("event_type").isin("click", "view"), "user")
        .when(F.col("event_type") == "error", "tool")
        .otherwise("assistant")
        .alias("role"),
        F.col("event_type").alias("text"),
    )


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.turns import sft_pairs

    ev = load(spark, sf_dir, "events")
    return sft_pairs(_turns_from_events(ev), n=3)


O_SFT_PAIRS = """
WITH t AS (
  SELECT CAST(user_id % 40 AS VARCHAR) AS conv_id,
         event_id AS turn_idx,
         CASE WHEN event_type IN ('click', 'view') THEN 'user'
              WHEN event_type = 'error' THEN 'tool'
              ELSE 'assistant' END AS role,
         event_type AS text
  FROM events
), ctx AS (
  SELECT conv_id, turn_idx, role, text,
         coalesce(string_agg(role || ': ' || text, chr(10))
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '') AS context
  FROM t
)
SELECT conv_id, turn_idx, context, text AS response
FROM ctx WHERE role = 'assistant' AND context != ''
"""


def q_stream_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of sft_pairs: per-conv rolling context via
    applyInPandasWithState (NoTimeout — pairs emit inline, so
    availableNow terminates normally). Same oracle as the batch op:
    streaming must produce the batch-equivalent answer under stable
    turn ordering."""
    from ..streaming.pipeline import stream_sft_pairs

    ev = load(spark, sf_dir, "events")
    turns = _turns_from_events(ev)
    feed = tempfile.mkdtemp(prefix="sft-feed-")
    turns.write.mode("overwrite").parquet(feed)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx bigint, role string, text string"
    ).parquet(feed)
    out = stream_sft_pairs(stream, n=3)
    _run_stream(out, "ssft")
    return spark.table("ssft")


EXT7_QUERIES: dict[str, QueryFn] = {
    "ottl_profile_context": q_ottl_profile_context,
    "decode_input": q_decode_input,
    "stream_recombine": q_stream_recombine,
    "pii_scrub": q_pii_scrub,
    "tf_idf": q_tf_idf,
    "stratified_sample": q_stratified_sample,
    "pack_sequences": q_pack_sequences,
    "c4_line_filter": q_c4_line_filter,
    "corpus_shuffle": q_corpus_shuffle,
    "kmeans_ivf": q_kmeans_ivf,
    "line_dedup": q_line_dedup,
    "sft_pairs": q_sft_pairs,
    "stream_sft_pairs": q_stream_sft_pairs,
}

EXT7_ORACLES: dict[str, str] = {
    "ottl_profile_context": O_OTTL_PROFILE_CONTEXT,
    "decode_input": O_DECODE_INPUT,
    "stream_recombine": O_STREAM_RECOMBINE,
    "pii_scrub": O_PII_SCRUB,
    "tf_idf": O_TF_IDF,
    "stratified_sample": O_STRATIFIED_SAMPLE,
    "pack_sequences": O_PACK_SEQUENCES,
    "c4_line_filter": O_C4_LINE_FILTER,
    "corpus_shuffle": O_CORPUS_SHUFFLE,
    "kmeans_ivf": O_KMEANS_IVF,
    "line_dedup": O_LINE_DEDUP,
    "sft_pairs": O_SFT_PAIRS,
    "stream_sft_pairs": O_SFT_PAIRS,
}
