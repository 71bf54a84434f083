"""Corpus / training-data query registry: dedup, similarity search,
text analysis, multimodal plumbing — over ``documents``/``embeddings``.

Same contract as ``queries.py``: ``(spark, sf_dir) -> DataFrame`` plus
a value-matched DuckDB oracle. Oracles that mirror md5-derived
structures (simhash bits, LSH hyperplanes, language marker lists) are
generated programmatically so both engines share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ..operators.multimodal import attach_binary, extract_media_meta, frame_sample
from ..operators.similarity import brute_force_topk, ivf_topk, lsh_bucket_topk
from .base import QueryFn, load

# DuckDB fragments shared by several oracles
_DUCK_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"


def _duck_shingles(n: int) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({_DUCK_TOKS}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({_DUCK_TOKS}, i, i + {n - 1}), ' ')))"
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return TX.exact_dedup(docs, "doc_id", "text")


O_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

_JAC_N, _JAC_T, _JAC_CAP = 3, 0.12, 64


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped: shingles shared by > _JAC_CAP docs are dropped
    from candidate generation AND from the similarity numerator (the
    standard stopword-shingle cap — without it a small shared
    vocabulary makes the bucket join quadratic; measured 389s -> <10s
    at sf0.1). The oracle mirrors the cap exactly."""
    docs = load(spark, sf_dir, "documents")
    return TX.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=_JAC_N, threshold=_JAC_T, max_bucket=_JAC_CAP
    )


O_NGRAM_JACCARD = f"""
WITH sh AS (SELECT doc_id, {_duck_shingles(_JAC_N)} AS shingles FROM documents),
ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
rare AS (SELECT * FROM ex QUALIFY count(*) OVER (PARTITION BY shingle) <= {_JAC_CAP})
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(count(*)::DOUBLE /
               (any_value(a.n_sh) + any_value(b.n_sh) - count(*)), 6) AS jaccard
  FROM rare a JOIN rare b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
) WHERE jaccard >= {_JAC_T}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (16 hashes, 4 bands x 4 rows)
# ---------------------------------------------------------------------------

_MH_K, _MH_BANDS, _MH_N, _MH_T = 16, 4, 3, 0.12


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return TX.minhash_lsh_dedup(
        docs, "doc_id", "text",
        num_hashes=_MH_K, bands=_MH_BANDS, shingle_n=_MH_N, verify_threshold=_MH_T,
    )


O_MINHASH_LSH = f"""
WITH sh AS (SELECT doc_id, {_duck_shingles(_MH_N)} AS shingles FROM documents),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
mh AS (
  SELECT doc_id, j, min(md5(j::VARCHAR || ':' || shingle)) AS minhash
  FROM ex CROSS JOIN (SELECT unnest(range({_MH_K})) AS j)
  GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, (j // {_MH_K // _MH_BANDS}) AS band,
         md5(string_agg(minhash, '|' ORDER BY j)) AS band_key
  FROM mh GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_key)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b,
         round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
) WHERE jaccard >= {_MH_T}
"""


# ---------------------------------------------------------------------------
# SimHash (32-bit)
# ---------------------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return TX.simhash32(docs, "doc_id", "text")


def _simhash_oracle() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN substring(md5(t), {b + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS b{b}"
        for b in range(32)
    )
    bits = " || ".join(
        f"CASE WHEN b{b} > 0 THEN '1' ELSE '0' END" for b in range(32)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents),
sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM sums
"""


O_SIMHASH = _simhash_oracle()


# ---------------------------------------------------------------------------
# language id
# ---------------------------------------------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.lang_id(F.col("text")).alias("detected_lang")
    )


def _lang_oracle() -> str:
    score_cols = []
    for lang, words in TX.LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(list_transform({_DUCK_TOKS}, t -> lower(t)), "
            f"t -> t IN ({lst}))) AS s_{lang}"
        )
    langs = list(TX.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    chain = "CASE " + " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH scores AS (SELECT doc_id, {", ".join(score_cols)} FROM documents),
bests AS (SELECT *, {best} AS best FROM scores)
SELECT doc_id, CASE WHEN best >= 1 THEN {chain} ELSE 'und' END AS detected_lang
FROM bests
"""


O_LANG_ID = _lang_oracle()


# ---------------------------------------------------------------------------
# quality features + token counting
# ---------------------------------------------------------------------------

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["distinct_token_ratio"].alias("distinct_token_ratio"),
    )


_STOP_LIST = ", ".join(f"'{w}'" for w in TX.STOPWORDS)

O_TEXT_QUALITY = f"""
SELECT doc_id,
  length(text) AS n_chars,
  len({_DUCK_TOKS}) AS n_tokens,
  round(list_aggregate(list_transform({_DUCK_TOKS}, t -> length(t)), 'sum')::DOUBLE
        / len({_DUCK_TOKS}), 6) AS avg_token_len,
  round(len(list_filter({_DUCK_TOKS}, t -> lower(t) IN ({_STOP_LIST})))::DOUBLE
        / len({_DUCK_TOKS}), 6) AS stopword_ratio,
  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
        / length(text), 6) AS alpha_ratio,
  round(len(list_distinct({_DUCK_TOKS}))::DOUBLE / len({_DUCK_TOKS}), 6)
    AS distinct_token_ratio
FROM documents
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens")
    )


O_TOKEN_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{TX.TOKEN_REGEX}')) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# document fingerprint
# ---------------------------------------------------------------------------

def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.doc_fingerprint(F.col("text"), shingle_n=4).alias("fingerprint")
    )


O_FINGERPRINT = f"""
SELECT doc_id,
       substring(list_min(list_transform({_duck_shingles(4)}, s -> md5(s))), 1, 16)
         AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# embedding similarity: brute-force cosine top-1 (exact baseline)
# ---------------------------------------------------------------------------

_DUCK_COS = (
    "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
)


def q_cosine_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRECTNESS BASELINE ONLY: self-ANN via brute force is O(n^2)
    with a corpus-sized broadcast — fenced by max_broadcast_rows (the
    test corpora are <=100k vectors). The scale paths for the same
    answer are lsh_ann / lsh_ann_multi / ivf_ann."""
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb, k=1, max_broadcast_rows=100_000)


O_COSINE_TOP1 = f"""
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DUCK_COS} AS cosine_sim,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
) WHERE rank <= 1
"""


# ---------------------------------------------------------------------------
# embedding similarity: LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

_LSH_PLANES, _LSH_DIM = 6, 64


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(emb, dim=_LSH_DIM, num_planes=_LSH_PLANES, k=1)


def _lsh_oracle() -> str:
    planes = []
    for p in range(_LSH_PLANES):
        comps = ", ".join(
            f"CASE WHEN substring(md5('{p}-{d}'), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END"
            for d in range(_LSH_DIM)
        )
        planes.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], [{comps}]) >= 0 "
            f"THEN '1' ELSE '0' END"
        )
    bucket = " || ".join(planes)
    return f"""
WITH withb AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DUCK_COS} AS cosine_sim,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
  FROM withb a JOIN withb b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
) WHERE rank <= 1
"""


O_LSH_ANN = _lsh_oracle()


# ---------------------------------------------------------------------------
# embedding similarity: IVF cell search (centroids = first 8 vectors)
# ---------------------------------------------------------------------------

def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    return ivf_topk(emb, centroids, k=1)


O_IVF_ANN = f"""
WITH centroids AS (
  SELECT vec_id AS centroid_id, embedding AS centroid FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(e.embedding::DOUBLE[], c.centroid::DOUBLE[]) /
                      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                       sqrt(list_dot_product(c.centroid::DOUBLE[], c.centroid::DOUBLE[]))), 12)
                      DESC, c.centroid_id) AS rn
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE rn = 1
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DUCK_COS} AS cosine_sim,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rank
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id != b.vec_id
) WHERE rank <= 1
"""


# ---------------------------------------------------------------------------
# multimodal plumbing (decode stubbed; metadata is a pure byte function)
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text")
    return extract_media_meta(media)


O_MULTIMODAL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) % 512 AS INT) AS fake_width,
       CAST((octet_length(encode(text)) * 7) % 512 AS INT) AS fake_height,
       CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END
         AS fake_format,
       md5(text) AS content_hash
FROM documents
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    media = attach_binary(docs, "doc_id", "text")
    frames = frame_sample(media, every_n_bytes=64, max_frames=8)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_bytes").cast("int").alias("frame_len")
    )


O_FRAME_SAMPLE = """
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
f AS (SELECT doc_id, n, least(8, greatest(1, n // 64)) AS n_frames FROM m)
SELECT doc_id,
       CAST(unnest(range(n_frames)) AS INT) AS frame_idx,
       CAST(least(64, greatest(0, n - unnest(range(n_frames)) * 64)) AS INT)
         AS frame_len
FROM f
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

CORPUS_QUERIES: dict[str, QueryFn] = {
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "cosine_top1": q_cosine_top1,
    "lsh_ann": q_lsh_ann,
    "ivf_ann": q_ivf_ann,
    "multimodal_meta": q_multimodal_meta,
    "frame_sample": q_frame_sample,
}

CORPUS_ORACLES: dict[str, str] = {
    "exact_dedup": O_EXACT_DEDUP,
    "ngram_jaccard": O_NGRAM_JACCARD,
    "minhash_lsh": O_MINHASH_LSH,
    "simhash": O_SIMHASH,
    "lang_id": O_LANG_ID,
    "text_quality": O_TEXT_QUALITY,
    "token_count": O_TOKEN_COUNT,
    "doc_fingerprint": O_FINGERPRINT,
    "cosine_top1": O_COSINE_TOP1,
    "lsh_ann": O_LSH_ANN,
    "ivf_ann": O_IVF_ANN,
    "multimodal_meta": O_MULTIMODAL,
    "frame_sample": O_FRAME_SAMPLE,
}
