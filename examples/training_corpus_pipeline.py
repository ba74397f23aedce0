"""End-to-end training-corpus pipeline — the north-star flow as a DAG.

  documents ─ profile (QA stats)
            ─ clean_corpus (repeat-collapse repair → PII scrub →
                            quality+repetition filter → exact+near dedup →
                            duplicate-span trim gate)
            ─ decontaminated (benchmark 8-gram overlap filter)
            ─ selected (per-language token-budget selection, quality-first)
            ─ indexed (dense global sample ids — shard-stable ordering)
            ─ packed (512-token sequence packs, sharded by language)
            ─ tokenizer (BPE merges learned from the cleaned corpus)
            ─ splits (leakage-safe train/val/test keyed on near-dup groups)
            ─ features (multimodal payload features via mapInPandas)
            ─ epoch_order (deterministic per-epoch shuffle keys)
            ─ embedding_model (PCA/whitening from moment partials)
            ─ extracted (jusText main-content + C4 line filter front door)
            ─ gopher_gate (named rule audit) ─ quality_model (learned scorer)
            ─ mixed (temperature n^0.5 language mixing)
            ─ curriculum (length-phase staged order, no global sort)

Run:  python examples/training_corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, sf_dir: str, out_dir: str):
    from impc_etl_spark.operators import text as T
    from impc_etl_spark.operators.dedup import (
        decontaminate,
        dup_spans,
        lsh_candidate_pairs,
    )
    from impc_etl_spark.operators.partitioning import assign_global_ids
    from impc_etl_spark.operators.joins import anti_join
    from impc_etl_spark.operators.profile import profile
    from impc_etl_spark.multimodal.media import attach_binary, media_features
    from impc_etl_spark.plans.runner import Pipeline
    from pyspark.sql import Window

    p = Pipeline(spark, out_dir)

    @p.task("documents")
    def documents(s):
        return s.read.parquet(f"{sf_dir}/documents.parquet")

    @p.task("profile", inputs=["documents"])
    def doc_profile(s, docs):
        return profile(docs, ["doc_id", "text", "lang", "source"])

    @p.task("clean_corpus", inputs=["documents"])
    def clean_corpus(s, docs):
        # repair consecutive-repeat runs BEFORE scoring so repetition
        # filters judge the cleaned text
        docs = T.collapse_repeats(docs, "text", out="text2").drop("text")
        docs = docs.withColumnRenamed("text2", "text")
        docs = docs.withColumn("text", T.scrub_pii("text"))
        docs = docs.withColumn("toks", T.tokens("text"))
        scored = T.add_quality_signals(docs, "text", tokens_col="toks")
        rep = T.repetition_signals(scored, "text", tokens_col="toks")
        kept = rep.where(
            (F.col("quality_score") >= 0.3) & (F.col("top_token_frac") <= 0.5)
        )
        fp = F.md5(F.array_join(F.col("toks"), " "))
        kept = (
            kept.withColumn("__k", F.min("doc_id").over(Window.partitionBy(fp)))
            .where(F.col("doc_id") == F.col("__k")).drop("__k")
            .localCheckpoint(eager=True)
        )
        losers = (
            lsh_candidate_pairs(kept, "text", "doc_id", tokens_col="toks")
            .select(F.col("doc_b").alias("doc_id")).distinct()
        )
        deduped = anti_join(kept, losers, ["doc_id"])
        # duplicate-SPAN gate: drop docs that are mostly corpus-shared
        # 8-grams (boilerplate survivors near-dup passes can't see)
        spans = dup_spans(deduped, "text", "doc_id", k=8, min_docs=2)
        spanny = spans.where(F.col("dup_frac") > 0.8).select("doc_id")
        return anti_join(deduped, spanny, ["doc_id"]).select(
            "doc_id", "text", "lang", F.size("toks").alias("n_tokens"),
            "quality_score",
        )

    @p.task("decontaminated", inputs=["clean_corpus", "documents"])
    def decontaminated(s, corpus, docs):
        # hold out a 'benchmark' slice (stand-in for an eval suite) and
        # strip any training doc sharing an 8-gram with it
        bench = docs.where(F.col("doc_id") % 97 == 0)
        return decontaminate(corpus, bench, k=8)

    @p.task("selected", inputs=["decontaminated"])
    def selected(s, corpus):
        out = T.budget_select(
            corpus, "n_tokens", budget=50_000,
            order_by=[F.col("quality_score").desc(), F.col("doc_id")],
            partition_keys=["lang"],
        )
        return out.where("selected").drop("selected")

    @p.task("indexed", inputs=["selected"])
    def indexed(s, corpus):
        return assign_global_ids(corpus, ["lang", "doc_id"], out="sample_id")

    @p.task("packed", inputs=["selected"])
    def packed(s, corpus):
        return T.pack_sequences(
            corpus, "n_tokens", budget=512, partition_keys=["lang"]
        )

    @p.task("tokenizer", inputs=["clean_corpus"])
    def tokenizer(s, corpus):
        # model state, not row data: 8 merge rules learned from word-TYPE
        # frequencies — the corpus-sized work is one groupBy
        return T.learn_bpe_merges(corpus, "text", num_merges=8,
                                  vocab_limit=300)

    @p.task("splits", inputs=["clean_corpus"])
    def splits(s, corpus):
        # near-dup GROUPS are the split unit: candidate pairs → connected
        # components → md5 split on the group id (singletons = own id)
        from impc_etl_spark.operators.dedup import connected_components
        from impc_etl_spark.operators.sampling import hash_split

        pairs = lsh_candidate_pairs(corpus, "text", "doc_id")
        groups = connected_components(pairs)
        labeled = corpus.select("doc_id").join(groups, "doc_id", "left").select(
            "doc_id", F.coalesce("group_id", F.col("doc_id")).alias("group_id")
        )
        return hash_split(
            labeled, ["group_id"], {"train": 0.9, "val": 0.05, "test": 0.05},
            salt="corpus",
        )

    @p.task("features", inputs=["selected"])
    def features(s, corpus):
        return media_features(attach_binary(corpus, "text", "doc_id"))

    @p.task("media_decoded", inputs=["selected"])
    def media_decoded(s, corpus):
        # REAL decode round-trips: image pixels (PNG inflate+unfilter →
        # mean luminance) and audio samples (WAV PCM → RMS/peak/ZCR) —
        # both narrow Arrow-batched maps, no shuffle
        from impc_etl_spark.multimodal.media import (
            decode_audio_features, decode_image_features, synth_gray_png,
            synth_wav,
        )

        payloads = attach_binary(corpus, "text", "doc_id")
        img = decode_image_features(synth_gray_png(payloads)).select(
            "media_id", "width", "height", "mean_luminance"
        )
        aud = decode_audio_features(synth_wav(payloads)).select(
            "media_id", "rms", "peak", "zcr"
        )
        return img.join(aud, "media_id")

    @p.task("epoch_order", inputs=["selected"])
    def epoch_order(s, corpus):
        # deterministic per-epoch training order: md5 rank keys, no RNG
        # state — resumable mid-epoch, identical on every engine/re-run
        from impc_etl_spark.operators.sampling import epoch_shuffle

        out = epoch_shuffle(corpus.select("doc_id", "lang"),
                            ["doc_id"], epoch=1, out="epoch1_key")
        return epoch_shuffle(out, ["doc_id"], epoch=2, out="epoch2_key")

    @p.task("embedding_model", inputs=[])
    def embedding_model(s):
        # PCA/whitening from mergeable moment partials: the projection
        # basis for semantic dedup / ANN, fit without any raw-vector
        # collect (driver sees ≤partitions sufficient-statistic rows)
        from impc_etl_spark.operators.similarity import pca_fit, pca_project

        emb = s.read.parquet(f"{sf_dir}/embeddings.parquet")
        mean, comps, evals = pca_fit(emb, "embedding", k=8, dim=64)
        proj = pca_project(emb, mean, comps, out="pca", whiten=evals)
        return proj.select(
            "vec_id", F.array_join(F.transform(
                "pca", lambda x: F.round(x, 6).cast("string")), ",",
            ).alias("pca_whitened"),
        )

    @p.task("extracted", inputs=["documents"])
    def extracted(s, docs):
        # crawl front door: jusText-style main-content extraction from a
        # page shell, then C4 line filtering of the recovered text
        html = F.concat(
            F.lit('<div class="nav"><a href="/">Home</a></div><p>'),
            F.col("text"),
            F.lit('</p><div class="footer"><a href="/l">Legal</a></div>'),
        )
        main = docs.select(
            "doc_id", T.extract_main_content(html).alias("main_text")
        )
        lines = main.select(
            "doc_id", F.split(F.col("main_text"), "\n").alias("page_lines")
        )
        return T.c4_clean(lines, "page_lines", min_lines=1)

    @p.task("gopher_gate", inputs=["clean_corpus"])
    def gopher_gate(s, corpus):
        # named-rule audit: word-count / mean-word-length / stopword tests
        words = F.split(F.col("text"), " ")
        wc = F.size(words)
        mwl = F.length(
            F.replace(F.col("text"), F.lit(" "), F.lit(""))
        ).cast("double") / F.greatest(wc, F.lit(1)).cast("double")
        return corpus.where(
            (wc >= 20) & (mwl >= 3.0) & (mwl <= 10.0)
        )

    @p.task("quality_model", inputs=["clean_corpus"])
    def quality_model(s, corpus):
        # distill the heuristic quality score into a learned linear model
        # (the fastText/CCNet pattern), then score every doc with it
        from impc_etl_spark.operators import learn

        L = F.length("text").cast("double")
        feats = corpus.select(
            "doc_id",
            (F.least(L, F.lit(600.0)) / F.lit(600.0)).alias("f_len"),
            (F.col("quality_score") >= 0.5).cast("int").alias("label"),
        )
        w, b = learn.logreg_fit(feats, ["f_len"], "label", iterations=8,
                                lr=8.0)
        return learn.logreg_score(feats, ["f_len"], w, b,
                                  score_col="learned_quality")

    @p.task("mixed", inputs=["selected"])
    def mixed(s, corpus):
        # temperature-scaled language mixing (share ∝ n^0.5): quotas from
        # the observed counts, filled by deterministic md5 rank
        from pyspark.sql import Window

        counts = corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("n_d"))
        quotas = counts.select(
            "lang",
            F.floor(
                F.lit(200.0) * F.sqrt(F.col("n_d").cast("double"))
                / F.sum(F.sqrt(F.col("n_d").cast("double"))).over(
                    Window.partitionBy()
                ) + F.lit(0.5)
            ).cast("int").alias("quota"),
        )
        rk = F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#mix"))),
                "doc_id",
            )
        )
        return corpus.join(F.broadcast(quotas), "lang").withColumn(
            "mix_rank", rk
        ).where(F.col("mix_rank") <= F.col("quota"))

    @p.task("curriculum", inputs=["selected"])
    def curriculum(s, corpus):
        # easy -> hard staged order: exact length-histogram phases +
        # md5 within-phase order keys (no global sort, no phase windows)
        from pyspark.sql import Window

        hist = corpus.groupBy(F.length("text").alias("len_v")).agg(
            F.count(F.lit(1)).alias("n_v")
        )
        bounds = hist.select(
            "len_v",
            (F.sum("n_v").over(Window.partitionBy().orderBy("len_v"))
             - F.col("n_v")).alias("cum_before"),
            F.sum("n_v").over(
                Window.partitionBy().orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n_total"),
        )
        return corpus.select(
            "doc_id", F.length("text").alias("len_v")
        ).join(F.broadcast(bounds), "len_v").select(
            "doc_id",
            F.floor(F.lit(4) * F.col("cum_before") / F.col("n_total"))
            .cast("int").alias("phase"),
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit("#cur"))).alias("order_key"),
        )

    @p.task("url_keys", inputs=["documents"])
    def url_keys(s, docs):
        # crawl-level dedup keys: canonical URL + registrable domain (the
        # per_key_sample grouping key for domain-balanced corpora)
        did = F.col("doc_id").cast("string")
        messy = F.concat(
            F.lit("HTTPS://WWW."), F.substring(F.md5("text"), 1, 6),
            F.lit(".Example.COM:443//d/"), did, F.lit("?utm_source=crawl#f"),
        )
        return docs.select(
            "doc_id",
            T.canonicalize_url(messy).alias("canonical_url"),
            T.url_domain(messy).alias("domain"),
        )

    return p


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_demo"
    from impc_etl_spark.session import get_spark

    spark = get_spark("training-corpus-demo")
    spark.sparkContext.setLogLevel("ERROR")
    p = build(spark, sf_dir, out_dir)
    statuses = p.run("profile", "indexed", "packed", "features",
                     "tokenizer", "splits", "extracted", "gopher_gate",
                     "quality_model", "mixed", "curriculum")
    for task, st in statuses.items():
        print(f"{task:15s} {st:6s} rows={p.read(task).count()}")
    packs = p.read("packed").groupBy("pack_id").agg(F.sum("n_tokens").alias("t"))
    print("packs:", packs.count(), "avg fill:",
          round(packs.agg(F.avg("t")).collect()[0][0], 1), "/ 512 budget target")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
