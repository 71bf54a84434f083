"""spark-submit entry point: the training-data curation pipeline.

Usage:
    spark-submit --py-files <zip> jobs/curation.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curation-out [--budget 2048] [--shards 16] \
        [--neardup components|pairs|off] [--sample en=0.5,de=1.0] \
        [--sink parquet|noop]

Composes the corpus operators into the end-to-end curation funnel a
training-data pipeline runs corpus-wide:

    scan -> PII scrub -> boilerplate line dedup -> C4 line filter
         -> Gopher quality rules -> [unigram-LM NLL band filter]
         -> exact dedup -> [duplicated-span filter]
         -> MinHash-LSH near-dup dedup
         -> annotate (quality score, token count)
         -> stratified sample (given per-lang rates) OR token-budget
            mix (rates DERIVED from a target mixture)
         -> sequence packing + deterministic shuffle
         -> per-shard partitioned parquet + lineage + funnel metrics

(Embedding-space stages — SemDeDup, ANN — run on the embeddings
table via their registry queries; this job is text-only.)

Every stage is pure DataFrame ops (the individual operators are each
oracle-verified in the registry); this job is the composition proof +
the throughput surface. Prints one JSON line with the per-stage funnel
counts and docs/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.graph import (
    dedup_keep_representative,
)
from opentelemetry_collector_contrib_spark.operators.text import (
    c4_line_filter,
    corpus_shuffle,
    dup_spans,
    exact_dedup,
    gopher_filter,
    line_dedup,
    minhash_lsh_dedup,
    mix_keep,
    pack_sequences,
    pii_scrub,
    quality_score,
    stratified_sample,
    token_count,
    unigram_nll,
)
from opentelemetry_collector_contrib_spark.runtime.lineage import LineageLog
from opentelemetry_collector_contrib_spark.session import get_spark


def synth_documents(spark, n_docs: int):
    """Deterministic synthetic documents (no external data).

    Each word is ``vocab[(base*131 + i*17) % 21] || murmur3(base, i) %
    9973`` — ~200k distinct tokens with no arithmetic structure, so
    unrelated docs share almost no 3-gram shingles. (A naive 21-token
    vocabulary makes EVERY doc a near-dup of every other — the LSH
    buckets degenerate to one giant component and the pair join goes
    quadratic, measured 106 s for 3k docs. A LINEAR suffix like
    ``(base*7 + i*3) % 997`` leaves congruence pairs — 27k unrelated
    >0.8-Jaccard pairs at 100k docs, measured via pair-gap histogram.)
    Seeded work for each funnel stage:
      - every 13th doc repeats its predecessor's text (exact dup),
      - every 11th doc repeats its predecessor + one extra sentence
        (near-dup: high Jaccard, different hash),
      - every 29th gets a PII tail, every 7th a junk line.
    """
    vocab = ("data spark table join filter scan value key row batch "
             "window agg column hash part order line small fast slow the").split()
    varr = F.array(*[F.lit(w) for w in vocab])
    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")

    stops = F.array(F.lit("the"), F.lit("is"), F.lit("of"), F.lit("and"), F.lit("to"))

    def words_for(base):
        # every 5th word is a bare stopword (Gopher's stopword rule
        # needs real ones); the rest carry a numeric suffix for vocab
        # width
        return F.transform(
            F.sequence(F.lit(1), (F.pmod(base * 37, F.lit(120)) + 20).cast("int")),
            lambda i: F.when(
                i % 5 == 0,
                F.element_at(stops, (F.pmod(base + i, F.lit(5)) + 1).cast("int")),
            ).otherwise(
                F.concat(
                    F.element_at(
                        varr, (F.pmod(base * 131 + i * 17, F.lit(len(vocab))) + 1).cast("int")
                    ),
                    # murmur3-mixed suffix: a LINEAR suffix (base*7+i*3
                    # mod p) leaves congruence structure that makes
                    # ~27k unrelated doc pairs at 100k docs share >80%
                    # of shingles (measured); a real hash has none
                    F.pmod(F.hash(base, i, F.lit(42)), F.lit(9973)).cast("string"),
                )
            ),
        )

    me = F.col("doc_id")
    prev = F.col("doc_id") - 1
    text = F.concat(F.array_join(words_for(me), " "), F.lit("."))
    prev_text = F.concat(F.array_join(words_for(prev), " "), F.lit("."))
    text = F.when(
        (F.pmod(me, F.lit(13)) == 0) & (me > 0), prev_text
    ).when(
        (F.pmod(me, F.lit(11)) == 0) & (me > 0),
        F.concat(prev_text, F.lit(" one extra trailing sentence here.")),
    ).otherwise(text)
    text = F.when(
        F.pmod(me, F.lit(29)) == 0,
        F.concat(text, F.lit(" contact admin@example.com now.")),
    ).otherwise(text)
    text = F.when(
        F.pmod(me, F.lit(7)) == 0,
        F.concat(text, F.lit("\nEnable JavaScript to continue {nav}")),
    ).otherwise(text)
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("zh"), F.lit("fr"), F.lit("es"))
    return df.select(
        "doc_id",
        text.alias("text"),
        F.element_at(langs, (F.pmod(me, F.lit(5)) + 1).cast("int")).alias("lang"),
        F.lit("synth").alias("source"),
    )


def parse_rates(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        if part:
            k, v = part.split("=")
            out[k.strip()] = float(v)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents parquet; default: synthesize")
    ap.add_argument("--docs", type=int, default=20_000, help="synthetic doc count")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--master", default=None)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--seed", default="epoch0")
    ap.add_argument(
        "--neardup", choices=["components", "pairs", "off"], default="components",
        help="components: transitive min-id representative (exact); "
        "pairs: greedy drop-larger-id (cheaper, non-transitive); off: skip",
    )
    ap.add_argument("--sample", default="", help="lang=rate[,lang=rate...]; empty = keep all")
    ap.add_argument(
        "--mix", default="",
        help="lang=weight[,lang=weight...]: derive per-lang keep rates "
        "from this target token mixture (overrides --sample)",
    )
    ap.add_argument(
        "--mix-budget", type=float, default=0.5,
        help="token budget for --mix as a fraction of corpus tokens",
    )
    ap.add_argument(
        "--nll-band", default="",
        help="lo,hi: keep docs whose unigram-LM mean NLL falls in "
        "[lo, hi] (CCNet perplexity-bucket analog); empty = off",
    )
    ap.add_argument(
        "--max-dup-frac", type=float, default=0.0,
        help="drop docs with more than this fraction of duplicated "
        "8-token windows (ExactSubstr-style); 0 disables",
    )
    ap.add_argument(
        "--boilerplate-pct", type=float, default=2.0,
        help="strip lines appearing in more than this %% of docs "
        "(CCNet boilerplate removal); 0 disables",
    )
    ap.add_argument(
        "--c4", choices=["on", "off"], default="on",
        help="off: skip the C4 line filter (corpora without sentence "
        "punctuation, e.g. keyword/code dumps, fail its prose rules)",
    )
    ap.add_argument(
        "--semdedup", type=int, default=0,
        help="run SemDeDup over deterministic token-histogram "
        "embeddings with this many k-means cells; 0 disables",
    )
    ap.add_argument(
        "--semdedup-threshold", type=float, default=0.95,
        help="within-cell cosine at/above which the larger id drops",
    )
    ap.add_argument(
        "--semdedup-max-cell", type=int, default=0,
        help="LSH-salt cells larger than this before the pair join "
        "(straggler cap); 0 disables",
    )
    ap.add_argument(
        "--dsir", type=float, default=0.0,
        help="DSIR importance resampling: keep the top FRAC of docs "
        "by hashed-unigram importance weight toward --dsir-target "
        "(Xie et al. 2023); 0 disables",
    )
    ap.add_argument(
        "--dsir-target", default="lang=en",
        help="target-distribution predicate as col=value",
    )
    ap.add_argument("--sink", choices=["parquet", "noop"], default="parquet")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="corpus-curation", master=args.master)
    lineage = LineageLog(args.out, run_id=args.run_id)
    t0 = time.time()
    stage_sec: dict[str, float] = {}
    _tick = [t0]

    def tick(name: str) -> None:
        now = time.time()
        stage_sec[name] = round(now - _tick[0], 2)
        _tick[0] = now

    docs = (
        spark.read.parquet(args.input)
        if args.input
        else synth_documents(spark, args.docs)
    )
    funnel: dict[str, int] = {"docs_in": docs.count()}
    tick("scan")
    lineage.record("scan", "all", funnel["docs_in"])

    # 1. PII scrub (transform, not filter) + boilerplate line removal
    # + C4 line cleaning
    docs = pii_scrub(docs, "text")
    if args.boilerplate_pct > 0:
        max_docs = max(1, int(funnel["docs_in"] * args.boilerplate_pct / 100))
        docs = (
            line_dedup(docs, "doc_id", "text", max_docs=max_docs)
            .join(docs.drop("text"), "doc_id")
            .drop("text", "n_lines", "n_kept_lines")
            .withColumnRenamed("clean_text", "text")
        )
    if args.c4 == "on":
        docs = (
            c4_line_filter(docs, "text", min_words=3, min_kept_lines=1)
            .filter(F.col("c4_keep"))
            .drop("text", "n_lines", "n_kept_lines", "c4_keep")
            .withColumnRenamed("clean_text", "text")
        )
    # 2. Gopher quality rules on the cleaned text
    keep_ids = gopher_filter(docs, "doc_id", "text").filter(F.col("keep")).select("doc_id")
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    # Materialize the filtered corpus once: three downstream consumers
    # (exact dedup, near-dup shingles, the final annotate) would each
    # re-run the scan+scrub+filter chain otherwise.
    cleaned = docs.persist()
    docs = cleaned
    funnel["after_clean"] = docs.count()
    tick("clean")
    lineage.record("clean", "all", funnel["after_clean"])

    # 2b. optional unigram-LM NLL band filter (CCNet keeps the middle
    # perplexity bucket: very low NLL = boilerplate, very high =
    # off-distribution noise)
    if args.nll_band:
        lo, hi = (float(x) for x in args.nll_band.split(","))
        # anti-join the SCORED-out-of-band docs: a doc with no score
        # (zero tokens -> no LM row) is unjudgeable, not out-of-band,
        # and must survive a pure band filter
        out_of_band = (
            unigram_nll(docs, "doc_id", "text")
            .filter(~F.col("nll").between(lo, hi))
            .select("doc_id")
        )
        # localCheckpoint (not persist): the score join splices a
        # multi-agg subtree into the lineage, and every downstream
        # ACTION re-analyzes the full logical plan even when the data
        # is cached — measured as +35 s of pure driver planning time
        # across the near-dup/pack stages at --docs 3000. Truncate it.
        # (On a real cluster use reliable checkpoint dirs; the job's
        # lineage manifest already covers resume.)
        docs = docs.join(out_of_band, "doc_id", "left_anti").localCheckpoint()
        funnel["after_lm_band"] = docs.count()
        tick("lm_band")
        lineage.record("lm_band", "all", funnel["after_lm_band"])

    # 3. exact dedup: keep the min-id representative per content hash.
    # localCheckpoint: the near-dup stage references this frame many
    # times and re-analyzes the full logical plan per action — cutting
    # the lineage here measured 15.6 s -> 4.4 s for the near-dup stage
    # at --docs 3000 (pure driver planning time, not execution).
    reps = exact_dedup(docs, "doc_id", "text").select("doc_id")
    docs = docs.join(reps, "doc_id", "left_semi").localCheckpoint()
    funnel["after_exact_dedup"] = docs.count()
    tick("exact_dedup")
    lineage.record("exact_dedup", "all", funnel["after_exact_dedup"])

    # 3b. optional duplicated-span filter (ExactSubstr-style: docs
    # dominated by cross-document repeated k-token windows are cheap
    # near-dup/boilerplate casualties exact-hash dedup can't see)
    if args.max_dup_frac > 0:
        # exempt_first: the smallest doc_id holding a span is its
        # canonical owner — the stage DEDUPLICATES (drops the copies)
        # rather than deleting every member of a duplicated group
        spanny = (
            dup_spans(docs, "doc_id", "text", k=8, exempt_first=True)
            .filter(F.col("dup_frac") > args.max_dup_frac)
            .select("doc_id")
        )
        docs = docs.join(spanny, "doc_id", "left_anti")
        funnel["after_dup_spans"] = docs.count()
        tick("dup_spans")
        lineage.record("dup_spans", "all", funnel["after_dup_spans"])

    # The optional filters splice multi-aggregation plans into the
    # lineage ABOVE the near-dup stage, which references `docs` many
    # times (signatures, band joins, verify) — materialize once so
    # those references don't re-run the LM/span aggregations
    # (measured 232 s -> ~40 s at --docs 3000 with all knobs on).
    # Same planning-time argument as the lm_band checkpoint above:
    # cut the optional-filter subtrees out of the near-dup plan.
    if args.nll_band or args.max_dup_frac > 0:
        docs = docs.localCheckpoint()

    # 4. near-dup dedup (MinHash->LSH->verify; candidate generation is
    # bucketed equi-joins — O(shingles), never O(pairs))
    if args.neardup != "off":
        pairs = minhash_lsh_dedup(docs, "doc_id", "text", verify_threshold=0.8)
        if args.neardup == "components":
            docs = dedup_keep_representative(docs, pairs)
        else:
            losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
            docs = docs.join(losers, "doc_id", "left_anti")
        # materialize: the iterative component labels would otherwise
        # recompute for every downstream action (count, both writes,
        # the read-back)
        deduped = docs.persist()
        docs = deduped
        funnel["after_neardup"] = docs.count()
        tick("neardup")
        lineage.record("neardup", "all", funnel["after_neardup"])

    # 4b. optional SemDeDup (embedding-space semantic dedup): cluster
    # deterministic token-histogram embeddings with k-means, drop
    # near-identical cell-mates (Abbas et al. 2023). The embedding is
    # pure codegen — 16 hashed-bucket token counts (+0.5 so no vector
    # is all-zero for the spherical quantizer) — deterministic across
    # runs with no external model; exact/near-dup docs land on
    # (near-)identical vectors. --semdedup-max-cell turns on the
    # oversized-cell LSH salt so one hot cluster can't straggle.
    if args.semdedup > 0:
        from opentelemetry_collector_contrib_spark.operators.similarity import (
            semantic_dedup,
        )

        buckets = 16
        dim_e = buckets + 1
        toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
        counts = [
            F.size(
                F.filter(
                    toks, lambda t: F.pmod(F.xxhash64(t), F.lit(buckets)) == d
                )
            ).cast("double")
            for d in range(buckets)
        ]
        total = counts[0]
        for c in counts[1:]:
            total = total + c
        # CENTERED histogram: raw token-count histograms all point near
        # the uniform diagonal (cosine ~0.86 between unrelated docs —
        # measured, it swallowed 84% of the corpus at 0.95); centering
        # turns cosine into correlation (unrelated ~0, dups ~1). The
        # constant 17th component keeps the vector non-zero when a
        # short doc's histogram is exactly uniform.
        emb = F.array(
            *[(c - total / buckets) for c in counts], F.lit(1.0)
        )
        # materialize the embedding ONCE: kmeans passes + the pair join
        # reference the vector column ~6 times, and re-evaluating the
        # 16-filter histogram expr per reference measured 77.6 s vs
        # materialized at --docs 3000
        with_emb = docs.select("doc_id", emb.alias("__emb")).localCheckpoint()
        sem = semantic_dedup(
            with_emb,
            k=args.semdedup,
            iters=2,
            threshold=args.semdedup_threshold,
            id_col="doc_id",
            vec_col="__emb",
            max_cell_size=args.semdedup_max_cell or None,
            dim=dim_e,
        )
        keepers = sem.filter(F.col("keep")).select("doc_id")
        # localCheckpoint: the k-means + pair-join subtree would
        # otherwise re-plan into every downstream action (the funnel's
        # standing stage-boundary rule)
        docs = docs.join(keepers, "doc_id", "left_semi").localCheckpoint()
        funnel["after_semdedup"] = docs.count()
        tick("semdedup")
        lineage.record("semdedup", "all", funnel["after_semdedup"])

    # 4c. optional DSIR importance resampling: score every doc by how
    # target-like its hashed-unigram distribution is, keep the top
    # fraction (distributed top-k via orderBy+limit —
    # TakeOrderedAndProject, no single-partition sort). Deterministic
    # tie-break on doc_id.
    if args.dsir > 0:
        from opentelemetry_collector_contrib_spark.operators.text import (
            dsir_weights,
        )

        tcol, tval = args.dsir_target.split("=", 1)
        n_now = docs.count()
        k_keep = int(n_now * args.dsir)
        w = dsir_weights(docs, target_pred=F.col(tcol) == tval, id_col="doc_id")
        keep_ids = (
            w.orderBy(F.desc("dsir_w"), F.asc("doc_id")).limit(k_keep)
            .select("doc_id")
        )
        docs = docs.join(keep_ids, "doc_id", "left_semi").localCheckpoint()
        funnel["after_dsir"] = docs.count()
        tick("dsir")
        lineage.record("dsir", "all", funnel["after_dsir"])

    # 5. annotate + stratified mixing sample
    docs = docs.withColumn("quality", quality_score(F.col("text"))).withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    if args.mix:
        # budget in the SAME token unit the packer bins (n_tokens, the
        # regex tokenizer) — not whitespace tokens; checkpoint so the
        # rate aggregations don't re-run per downstream action
        docs = mix_keep(docs, parse_rates(args.mix),
                        budget_frac=args.mix_budget, strata_col="lang",
                        tokens_count_col="n_tokens").localCheckpoint()
        funnel["after_sample"] = docs.count()
        tick("mix")
        lineage.record("mix", "all", funnel["after_sample"])
    elif args.sample:
        docs = stratified_sample(docs, "lang", parse_rates(args.sample),
                                 id_col="doc_id", default_rate=1.0)
        funnel["after_sample"] = docs.count()
        tick("sample")
        lineage.record("sample", "all", funnel["after_sample"])

    # 6. pack + shuffle + write (bins use the SAME token definition as
    # the n_tokens annotation — one tokenizer end-to-end)
    docs = corpus_shuffle(docs, seed=args.seed, shard_prefix_len=1)
    bins = pack_sequences(
        docs, budget=args.budget, shards=args.shards,
        tokens_count_col="n_tokens",
    )
    funnel["bins"] = bins.count()
    tick("pack")
    t_plan = time.time()

    if args.sink == "parquet":
        (docs.write.mode("overwrite")
         .partitionBy("shuffle_shard")
         .parquet(os.path.join(args.out, "sink=curated")))
        bins.write.mode("overwrite").parquet(os.path.join(args.out, "sink=bins"))
        if funnel["bins"] > 0:
            shard_counts = lineage.record_counts(
                "curated",
                spark.read.parquet(os.path.join(args.out, "sink=curated")),
                "shuffle_shard",
            )
            funnel["written"] = sum(shard_counts.values())
        else:
            # an empty funnel writes an empty (schema-less) sink —
            # nothing to read back, but the job must still report
            funnel["written"] = 0
            lineage.record("curated", "all", 0)
    else:
        docs.write.format("noop").mode("overwrite").save()
        funnel["written"] = funnel.get(
            "after_sample",
            funnel.get(
                "after_dsir",
                funnel.get(
                    "after_semdedup",
                    funnel.get("after_neardup", funnel["after_exact_dedup"]),
                ),
            ),
        )
    cleaned.unpersist()
    if args.neardup != "off":
        deduped.unpersist()
    elapsed = time.time() - t0

    print(json.dumps({
        "funnel": funnel,
        "sec": round(elapsed, 2),
        "docs_per_sec": round(funnel["docs_in"] / elapsed, 1),
        "phases": {"plan": round(t_plan - t0, 2), "write": round(elapsed - (t_plan - t0), 2)},
        "stage_sec": stage_sec,
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
