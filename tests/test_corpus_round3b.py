"""Round-3 batch-B corpus/pipeline ops: TF-IDF top-k, stratified
sampling, sequence packing, PII scrub ordering, input-encoding decode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.parse import decode_input
from opentelemetry_collector_contrib_spark.operators.text import (
    pack_sequences,
    pii_scrub,
    stratified_sample,
    tf_idf_topk,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "apple apple banana", "en"),
        (1, "banana cherry", "en"),
        (2, "cherry cherry cherry date", "de"),
        (3, "apple", "zh"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_tf_idf_ranks_rare_terms_over_common(docs):
    out = tf_idf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 'cherry' tf=3 df=2 -> 6.0; 'date' tf=1 df=1 -> 4.0
    d2 = {r.term: r for r in by_doc[2]}
    assert d2["cherry"].rank == 1 and d2["cherry"].tfidf == pytest.approx(6.0)
    assert d2["date"].rank == 2 and d2["date"].tfidf == pytest.approx(4.0)
    # per-doc cap respected, ranks contiguous from 1
    for doc, rows in by_doc.items():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def test_tf_idf_tie_breaks_on_term(spark):
    df = spark.createDataFrame([(0, "b a")], ["doc_id", "text"])
    out = tf_idf_topk(df, k=2).orderBy("rank").collect()
    # identical scores -> lexicographic term order decides ranks
    assert [r.term for r in out] == ["a", "b"]


def test_stratified_rate_extremes(docs):
    # rate 1.0 keeps everything in the stratum, 0.0 drops it
    kept = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0},
                             default_rate=0.0)
    rows = kept.select("doc_id", "lang").collect()
    assert {r.lang for r in rows} == {"en"}
    assert {r.doc_id for r in rows} == {0, 1}


def test_stratified_empty_rates_uses_default(docs):
    assert stratified_sample(docs, "lang", {}, default_rate=1.0).count() == 4
    assert stratified_sample(docs, "lang", {}, default_rate=0.0).count() == 0


def test_stratified_is_deterministic(docs):
    a = {r.doc_id for r in
         stratified_sample(docs, "lang", {"en": 0.5}, default_rate=0.5).collect()}
    b = {r.doc_id for r in
         stratified_sample(docs, "lang", {"en": 0.5}, default_rate=0.5).collect()}
    assert a == b


def test_pack_sequences_cuts_at_budget(spark):
    # one shard; docs of 3 tokens each, budget 6 -> bins of 2 docs
    rows = [(i, "a b c") for i in range(0, 12, 2)]  # even ids, shard 0 of 2
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, budget=6, shards=2).orderBy("bin").collect()
    assert all(r.shard == 0 for r in out)
    assert [r.n_docs for r in out] == [2, 2, 2]
    assert [r.bin_tokens for r in out] == [6, 6, 6]
    # bins partition the shard's docs in id order
    assert out[0].last_doc < out[1].first_doc < out[2].first_doc


def test_pack_sequences_oversized_doc_owns_its_start_bin(spark):
    big = " ".join(["w"] * 100)  # 100 tokens >> budget 10
    df = spark.createDataFrame(
        [(0, "a b"), (2, big), (4, "c d")], ["doc_id", "text"])
    out = {r.first_doc: r for r in pack_sequences(df, budget=10, shards=1).collect()}
    # doc 2 starts at offset 2 -> bin 0 (with doc 0); doc 4 at offset
    # 102 -> bin 10: the oversized doc pushes followers far ahead,
    # concat-and-chunk semantics
    assert out[0].n_docs == 2
    assert out[4].bin == 10


def test_pii_scrub_order_email_before_ip(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@10.0.0.1.example.com from 10.0.0.1 ssn 123-45-6789 "
             "tel 555.123.4567 card 4111-1111-1111-1111")],
        ["doc_id", "text"])
    txt = pii_scrub(df).first().text
    assert "<EMAIL>" in txt and "bob@" not in txt
    assert "<IP>" in txt and "10.0.0.1" not in txt
    assert "<SSN>" in txt and "<PHONE>" in txt and "<CC>" in txt


def test_decode_input_nop_is_byte_lossless(spark):
    payload = bytes(range(256))
    df = spark.createDataFrame([(1, payload)], ["id", "raw"])
    body = decode_input(df, source="raw", encoding="nop").first().body
    assert body.encode("latin-1") == payload


def test_decode_input_unknown_encoding_raises(spark):
    df = spark.createDataFrame([(1, b"x")], ["id", "raw"])
    with pytest.raises(ValueError, match="unsupported encoding"):
        decode_input(df, source="raw", encoding="klingon-8")


def test_decode_input_iana_codec_path(spark):
    # gb18030 is absent from the JVM fast-path table, so this exercises
    # the Arrow codec UDF with real non-ASCII multibyte input
    s = "café 中文"
    df = spark.createDataFrame([(1, s.encode("gb18030"))], ["id", "raw"])
    out = decode_input(df, source="raw", encoding="gb18030")
    assert out.first().body == s


def test_c4_line_filter_strips_junk(spark):
    from opentelemetry_collector_contrib_spark.operators.text import c4_line_filter
    txt = "\n".join([
        "A perfectly normal sentence with words.",
        "if (x) { y(); }",
        "Please enable JavaScript to continue browsing.",
        "lorem ipsum dolor sit amet today.",
        "No punct ending here",
        "ok.",  # < 3 words
        'He said "stop".',
    ])
    df = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    r = c4_line_filter(df, min_words=3, min_kept_lines=2).first()
    assert r.n_lines == 7
    kept = r.clean_text.split("\n")
    assert kept == ["A perfectly normal sentence with words.", 'He said "stop".']
    assert r.n_kept_lines == 2 and r.c4_keep is True


def test_c4_keep_threshold(spark):
    from opentelemetry_collector_contrib_spark.operators.text import c4_line_filter
    df = spark.createDataFrame([(1, "One good sentence here.")], ["doc_id", "text"])
    assert c4_line_filter(df, min_kept_lines=2).first().c4_keep is False
    assert c4_line_filter(df, min_kept_lines=1).first().c4_keep is True


def test_corpus_shuffle_seed_and_determinism(spark):
    from opentelemetry_collector_contrib_spark.operators.text import corpus_shuffle
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = corpus_shuffle(df, seed="e0").select("doc_id", "shuffle_shard", "shuffle_rank")
    b = corpus_shuffle(df, seed="e0").select("doc_id", "shuffle_shard", "shuffle_rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = corpus_shuffle(df, seed="e1").select("doc_id", "shuffle_shard", "shuffle_rank")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))
    # ranks are contiguous 1..n within every shard
    rows = a.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shuffle_shard, []).append(r.shuffle_rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_kmeans_lloyd_properties(spark):
    from opentelemetry_collector_contrib_spark.operators.similarity import (
        ivf_topk,
        kmeans_lloyd,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, centroids = kmeans_lloyd(emb, k=4, iters=2)
    rows = assigned.select("vec_id", "cell").collect()
    # every vector lands in exactly one of the k cells; no cell empty
    cells = {r.cell for r in rows}
    assert cells <= set(range(4)) and len(cells) == 4
    assert len(rows) == emb.count()
    # determinism
    again, _ = kmeans_lloyd(emb, k=4, iters=2)
    assert sorted((r.vec_id, r.cell) for r in again.select("vec_id", "cell").collect()) \
        == sorted((r.vec_id, r.cell) for r in rows)
    # centroids have the embedding dimension and feed ivf_topk directly
    assert len(centroids) == 4 and all(len(c) == 64 for c in centroids)
    cdf = spark.createDataFrame(
        [(j, c) for j, c in enumerate(centroids)], ["centroid_id", "centroid"])
    topk = ivf_topk(emb, cdf, k=1)
    assert topk.count() > 0


# ---------------------------------------------------------------------------
# seeded invariant sweeps (one Spark job each, random-but-reproducible
# corpus; the conservation contracts the ops must never break)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def messy(spark):
    import random
    rng = random.Random(1337)
    words = ["alpha", "beta", "the", "x9", "...", "{code}", "bob@x.io",
             "10.1.2.3", "word", "emoji☃"]
    rows = []
    for i in range(300):
        n = rng.randint(0, 40)
        txt = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.3:
            txt += "\n" + " ".join(rng.choice(words) for _ in range(rng.randint(0, 9)))
        rows.append((i, txt, rng.choice(["en", "de", "zh"])))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_pack_conserves_docs_and_tokens(messy):
    from opentelemetry_collector_contrib_spark.operators.text import token_count
    from pyspark.sql import functions as F
    exp_docs = messy.count()
    exp_tokens = messy.select(
        F.sum(F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")))
    ).first()[0]
    got = pack_sequences(messy, budget=37, shards=5).agg(
        F.sum("n_docs"), F.sum("bin_tokens")).first()
    assert got[0] == exp_docs and got[1] == exp_tokens


def test_stratified_monotone_in_rate(messy):
    lo = {r.doc_id for r in stratified_sample(messy, "lang", {"en": 0.3},
                                              default_rate=0.2).collect()}
    hi = {r.doc_id for r in stratified_sample(messy, "lang", {"en": 0.7},
                                              default_rate=0.6).collect()}
    assert lo <= hi  # raising every rate only ever ADDS docs


def test_corpus_shuffle_is_permutation(messy):
    from opentelemetry_collector_contrib_spark.operators.text import corpus_shuffle
    out = corpus_shuffle(messy).select("doc_id", "shuffle_shard", "shuffle_rank")
    rows = out.collect()
    assert len(rows) == messy.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    assert len({(r.shuffle_shard, r.shuffle_rank) for r in rows}) == len(rows)


def test_pii_scrub_idempotent(messy):
    once = pii_scrub(messy).select("doc_id", "text")
    twice = pii_scrub(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_c4_clean_lines_subset(messy):
    from opentelemetry_collector_contrib_spark.operators.text import c4_line_filter
    for r in c4_line_filter(messy).collect():
        orig = set((r.text or "").split("\n"))
        kept = [l for l in (r.clean_text or "").split("\n") if l != ""]
        assert r.n_kept_lines <= r.n_lines
        assert all(l in orig for l in kept)


def test_line_dedup_boilerplate_and_order(spark):
    from opentelemetry_collector_contrib_spark.operators.text import line_dedup
    rows = [
        (1, "FOOTER\nalpha\nbeta\nFOOTER"),
        (2, "FOOTER\ngamma\n\ndelta"),
        (3, "FOOTER"),  # all boilerplate -> empty doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, max_docs=1).collect()}
    # shared FOOTER stripped everywhere; per-doc order preserved
    assert out[1].clean_text == "alpha\nbeta"
    assert out[2].clean_text == "gamma\ndelta"  # blank line also gone
    assert out[3].clean_text == "" and out[3].n_kept_lines == 0
    # counts: blanks excluded from n_lines
    assert out[2].n_lines == 3 and out[2].n_kept_lines == 2


def test_line_dedup_max_docs_threshold(spark):
    from opentelemetry_collector_contrib_spark.operators.text import line_dedup
    rows = [(1, "shared\nmine1"), (2, "shared\nmine2")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    loose = {r.doc_id: r.clean_text for r in line_dedup(df, max_docs=2).collect()}
    assert loose[1] == "shared\nmine1"  # df=2 allowed at max_docs=2


def test_turn_context_and_sft_pairs(spark):
    from opentelemetry_collector_contrib_spark.operators.turns import (
        sft_pairs,
        turn_context,
    )
    rows = [
        ("c1", 1, "user", "hi"),
        ("c1", 2, "assistant", "hello"),
        ("c1", 3, "user", "weather?"),
        ("c1", 4, "tool", "sunny"),
        ("c1", 5, "assistant", "it is sunny"),
        ("c2", 1, "assistant", "opener with no prompt"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    ctx = {(r.conv_id, r.turn_idx): r.context
           for r in turn_context(df, n=3).collect()}
    assert ctx[("c1", 1)] == ""                       # opener: empty context
    assert ctx[("c1", 2)] == "user: hi"
    assert ctx[("c1", 5)] == "assistant: hello\nuser: weather?\ntool: sunny"
    # n=3 window truncates: turn 1 no longer visible from turn 5
    pairs = {(r.conv_id, r.turn_idx): r for r in sft_pairs(df, n=3).collect()}
    assert set(pairs) == {("c1", 2), ("c1", 5)}       # opener pair dropped
    assert pairs[("c1", 5)].response == "it is sunny"


def test_kmeans_k_exceeds_corpus(spark):
    from opentelemetry_collector_contrib_spark.operators.similarity import kmeans_lloyd
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(3)
    assigned, centroids = kmeans_lloyd(emb, k=6, iters=2)
    # k clamps to the corpus size: every row its own cluster
    assert len(centroids) == 3
    assert {r.cell for r in assigned.select("cell").collect()} == {0, 1, 2}


def test_line_dedup_trim_keyed_frequency(spark):
    from opentelemetry_collector_contrib_spark.operators.text import line_dedup
    rows = [(1, "FOOTER \nmine1"), (2, "FOOTER\nmine2"), (3, " FOOTER\nmine3")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.clean_text for r in line_dedup(df, max_docs=1).collect()}
    # whitespace variants of the same boilerplate all strip
    assert out == {1: "mine1", 2: "mine2", 3: "mine3"}


def test_decode_input_malformed_bytes_replace(spark):
    # Spark 4 decode() fail-fast default must not kill the job: the
    # operator restores the reference's U+FFFD substitution
    df = spark.createDataFrame([(1, bytes([0x66, 0xFF, 0x67]))], ["id", "raw"])
    assert decode_input(df, source="raw", encoding="utf-8").first().body == "f�g"


def test_stream_sft_matches_batch(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.operators.turns import sft_pairs
    from opentelemetry_collector_contrib_spark.streaming.pipeline import (
        stream_sft_pairs,
    )
    rows = [
        ("c1", 1, "user", "hi"),
        ("c1", 2, "assistant", "hello"),
        ("c1", 3, "user", "weather?"),
        ("c1", 4, "assistant", "sunny"),
        ("c2", 1, "assistant", "opener"),
        ("c2", 2, "user", "q"),
        ("c2", 3, "assistant", "a"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    feed = str(tmp_path / "feed")
    df.write.parquet(feed)
    stream = spark.readStream.schema(
        "conv_id string, turn_idx bigint, role string, text string"
    ).parquet(feed)
    ck = str(tmp_path / "ck")
    (stream_sft_pairs(stream, n=3).writeStream.format("memory")
     .queryName("sftb").outputMode("append")
     .option("checkpointLocation", ck)
     .trigger(availableNow=True).start().awaitTermination(120))
    got = sorted(map(tuple, spark.table("sftb").collect()))
    want = sorted(map(tuple, sft_pairs(df, n=3).collect()))
    assert got == want and len(want) == 3
