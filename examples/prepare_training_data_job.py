"""End-to-end training-data preparation: the full north-star pipeline on the
engine's operators, from raw corpus to reproducible train/val/test splits.

  raw docs
   → URL blocklist           (optional: registrable-domain broadcast
                              anti-join — web.filter_blocklist)
   → URL-exact dedup         (optional: canonicalize_url as the dedup key —
                              click-id/fragment/case variants of one
                              resource collapse before any text work)
   → PII redaction           (pure-codegen regex cascade, no UDF)
   → quality + language gate (heuristic band + logistic model score, both
                              column expressions fused into the scan)
   → LM-surprise gate        (self-trained unigram LM: drops the gibberish
                              tail the linear model can't see)
   → CCNet bucket gate       (optional: head/middle/tail perplexity
                              terciles, keep a relative slice)
   → decontamination         (optional: drop docs sharing an 8-gram with
                              a benchmark parquet — broadcast shingles,
                              corpus text never shuffles; also publishes
                              a per-benchmark-item leak-report sidecar)
   → near-dup CLUSTERING     (n-gram Jaccard pairs → connected components;
                              keeps the canonical doc per cluster, unlike
                              pairwise loser-dropping which over-deletes
                              transitive chains)
   → span-level audit        (shared verbatim passages ≥ 12 tokens among
                              survivors, written alongside the corpus —
                              the reviewable evidence for a later cut pass)
   → stratified downsample   (per-source md5-range fractions — reproducible
                              across runs, clusters, partitionings)
   → token-budget mixing     (optional: equal-share domain mix within a
                              char budget — mix_to_proportions)
   → train/val/test split    (disjoint md5 ranges, auditable contract;
                              with --keep-near-dups the split key is the
                              dedup CLUSTER — sampling.leakage_safe_split —
                              so retained duplicates never straddle splits)
   → partitioned write       (split=... directories)
   → snapshot diff           (optional: corpus_diff vs --prev-corpus —
                              the added/removed/changed audit of a
                              recurring refresh)
   → sequence packing        (optional: whole-doc concat into fixed-token
                              training sequences — pack_sequences)

Run:
    python -m scalding_spark.tool \
        examples.prepare_training_data_job.PrepareTrainingDataJob \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/corpus
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.functions import dedup, lm, sampling
from scalding_spark.functions import text as tx


class PrepareTrainingDataJob(Job):
    def build(self) -> None:
        docs = self.spark.read.parquet(self.args("input"))
        raw = docs  # kept for the optional drift report (step 10)

        # 0. URL blocklist (optional, needs a url column + a one-column
        # domain parquet): registrable-domain broadcast anti-join — the
        # corpus never shuffles for this gate
        bl_path = self.args.getOrElse("blocklist", "")
        if bl_path:
            from scalding_spark.functions import web
            docs = web.filter_blocklist(
                docs, self.args.getOrElse("url-col", "url"),
                self.spark.read.parquet(bl_path))

        # 0b. URL-exact dedup (optional, needs a url column): canonical
        # URL as the dedup key — fragment/tracking-param/case variants of
        # one resource collapse to the lowest doc_id BEFORE any text
        # processing pays for them; unparseable URLs (NULL canonical) are
        # all kept — no URL evidence is not duplication evidence
        if self.args.boolean("canonicalize-urls"):
            from scalding_spark.functions import web
            url_col = self.args.getOrElse("url-col", "url")
            curl = web.canonicalize_url(F.col(url_col))
            # min-doc_id per canonical via groupBy + join, NOT a window
            # over the whole frame: unparseable URLs (NULL canonical) are
            # unconditionally kept and never need the min, but a window
            # partitioned on __curl would funnel ALL of them into one
            # task — a web-scale hot spot (ADVICE r06). The aggregate is
            # map-side combined; NULL canonicals never reach it.
            tagged = docs.withColumn("__curl", curl)
            umin = (tagged.where(F.col("__curl").isNotNull())
                    .groupBy("__curl")
                    .agg(F.min("doc_id").alias("__umin")))
            docs = (tagged.join(umin, "__curl", "left")
                    .where(F.col("__curl").isNull()
                           | (F.col("doc_id") == F.col("__umin")))
                    .drop("__curl", "__umin"))

        # 1. redact PII in place (email/IP/phone — shared regex constants)
        docs = docs.withColumn("text", tx.pii_redact(F.col("text")))

        # 2. quality + language gate: heuristic band AND the logistic model
        # (both pure expressions — the two filters fuse into one scan pass)
        min_q = float(self.args.getOrElse("min-quality", "0.3"))
        min_model = float(self.args.getOrElse("min-model-score", "0.2"))
        docs = docs.where(
            (tx.quality_score(F.col("text")) >= min_q)
            & (tx.linear_quality_score(F.col("text")) >= min_model))
        lang = self.args.getOrElse("lang", "")
        if lang:
            docs = docs.where(tx.lang_id(F.col("text")) == lang)

        # 2b. Gopher-rule gate (optional): exact-integer length /
        # mean-word-length / numeric-cap / stopword-floor bands — another
        # pure expression that fuses into the same scan pass
        if self.args.boolean("gopher"):
            docs = docs.where(tx.gopher_pass(F.col("text")))

        # 3. LM-surprise gate: drop the most off-distribution tail by
        # self-trained unigram LM. LEFT join: token-less docs have no LM
        # score (nothing to average) — a gate on "too surprising" must keep
        # them, not silently delete them via an inner join.
        max_surprise = self.args.getOrElse("max-neg-logp", "")
        if max_surprise:
            scores = lm.unigram_lm_score(docs, "text", "doc_id")
            docs = (docs.join(scores.select("doc_id", "avg_neg_logp"),
                              "doc_id", "left")
                    .where(F.col("avg_neg_logp").isNull()
                           | (F.col("avg_neg_logp") <= float(max_surprise)))
                    .drop("avg_neg_logp"))

        # 3a. CCNet perplexity buckets (optional): rank the corpus into
        # head/middle/tail by LM surprise and keep only --ccnet-keep
        # buckets (exact floor(n·f) cuts — complements the absolute
        # --max-neg-logp gate with a RELATIVE one)
        ccnet_keep = self.args.getOrElse("ccnet-keep", "")
        if ccnet_keep:
            keep = {b.strip() for b in ccnet_keep.split(",") if b.strip()}
            bucketed = lm.perplexity_buckets(docs, "text", "doc_id")
            # anti-join the DROPPED buckets: token-less docs have no LM
            # score (absent from the bucketing) and must be kept, same
            # contract as the --max-neg-logp gate above
            docs = docs.join(
                bucketed.where(~F.col("bucket").isin(*keep))
                .select("doc_id"), "doc_id", "left_anti")

        # 3b'. benchmark decontamination (optional): drop docs sharing any
        # 8-gram with an eval-set document — the guard against benchmark
        # leakage into training data. Benchmark shingles broadcast; the
        # corpus text never shuffles for this gate.
        bench_path = self.args.getOrElse("benchmark", "")
        if bench_path:
            from scalding_spark.session import materialize
            bench = self.spark.read.parquet(bench_path)
            # The sidecar write is a SEPARATE action from the main flow,
            # so materialize the gated corpus first — otherwise every
            # upstream gate (blocklist, URL dedup, PII, quality/LM/CCNet)
            # executes twice, once per action (ADVICE r06). Same
            # share-one-computation contract as step 9b's read-back.
            docs = materialize(docs)
            # leak report FIRST (against the pre-drop corpus — after the
            # drop every count would read zero), published as a sidecar:
            # the eval owner's per-item evidence for what was burned
            bid = self.args.getOrElse("benchmark-id-col", bench.columns[0])
            dedup.contamination_report(
                docs, bench.withColumnRenamed(bid, "bench_id"),
                "text", "doc_id", "bench_id") \
                .write.mode("overwrite").parquet(
                    self.args("output").rstrip("/") + "_contamination")
            docs = dedup.decontaminate(docs, bench, "text", "doc_id")

        # 3b. DSIR selection (optional): keep the --dsir-k docs most like a
        # target corpus (hashed-ngram importance resampling — the
        # "make the crawl look like curated text" lever)
        target_path = self.args.getOrElse("dsir-target", "")
        if target_path:
            k = int(self.args.getOrElse("dsir-k", "1000"))
            target = self.spark.read.parquet(target_path)
            docs = lm.importance_resample(docs, target, "text", "doc_id",
                                          k=k).drop("log_weight")

        # 4. near-dup clustering: keep one canonical doc per component —
        # or, with --keep-near-dups, keep the natural duplicate
        # distribution (some training recipes want it) and carry the
        # cluster labels forward so step 8 can split by CLUSTER instead
        # of by document (duplicates must never straddle train/test)
        thr = float(self.args.getOrElse("jaccard", "0.5"))
        pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                          n=3, threshold=thr)
        clustered = dedup.dedup_clusters(docs, pairs, "doc_id")
        keep_dups = self.args.boolean("keep-near-dups")
        if keep_dups:
            kept = clustered
        else:
            kept = clustered.where(F.col("doc_id") == F.col("cluster_id")) \
                .drop("cluster_id")

        # 5. span-level audit: verbatim shared passages among the survivors
        # (evidence table for a later passage-cut pass, not a filter here)
        spans = dedup.shared_ngram_spans(kept, "text", "doc_id",
                                         n=4, min_len=12)
        spans.write.mode("overwrite").parquet(
            self.args("output").rstrip("/") + "_shared_spans")

        # 5b. optional cut pass: actually remove the duplicated passages
        # from the higher-id copies (Lee-et-al span dedup) instead of just
        # auditing them. Rewritten docs carry normalized token text.
        if self.args.boolean("cut-spans"):
            # re-read the audit parquet just written: a free checkpoint —
            # the cut pass must not recompute the span-detection join
            spans = self.spark.read.parquet(
                self.args("output").rstrip("/") + "_shared_spans")
            kept = dedup.cut_spans(kept, spans, "text", "doc_id") \
                .drop("n_cut_tokens")

        # 6. per-source stratified downsample (defaults: keep everything).
        # salt= is MANDATORY hygiene here: md5-range stages keyed on the
        # same column with the same salt share one hash, so their
        # memberships CORRELATE — a 0.9 downsample under the default salt
        # keeps exactly the hash range the later 90/5/5 split labels
        # 'train' and val/test come out EMPTY (caught by the all-options
        # composition run; tests/test_cc_sampling.py pins the hazard)
        frac = float(self.args.getOrElse("keep-fraction", "1.0"))
        if frac < 1.0:
            sources = [r["source"] for r in
                       kept.select("source").distinct().collect()]
            kept = sampling.stratified_sample(
                kept, "doc_id", "source", {s: frac for s in sources},
                salt="downsample")

        # 7. token-budget domain mixing (optional): resample sources toward
        # equal shares of a char budget — reproducible md5 cutoffs derived
        # from exact integer size sums
        mix_budget = self.args.getOrElse("mix-budget-chars", "")
        if mix_budget:
            sources = [r["source"] for r in
                       kept.select("source").distinct().collect()]
            kept = sampling.mix_to_proportions(
                kept, "doc_id", "source", "n_chars",
                {s: 1.0 / len(sources) for s in sources},
                total=int(mix_budget), salt="mix")

        # 8. reproducible splits + partitioned write. With retained
        # near-dups the split key is the dedup cluster (restricted to
        # multi-doc clusters — the duplicate fraction — and broadcast,
        # the documented production shape), so no cluster straddles
        # train/test; without them every survivor is its own cluster and
        # the plain per-doc split is already leakage-safe.
        if keep_dups:
            labels = kept.select("doc_id", "cluster_id")
            multi = (labels.groupBy("cluster_id")
                     .agg(F.count(F.lit(1)).alias("__n"))
                     .where(F.col("__n") > 1).select("cluster_id"))
            labels = labels.join(multi, "cluster_id") \
                .select("doc_id", "cluster_id")
            out = sampling.leakage_safe_split(
                kept.drop("cluster_id"), "doc_id", labels,
                broadcast_labels=True)
        else:
            out = sampling.train_val_test_split(kept, "doc_id")
        out.write.mode("overwrite").partitionBy("split") \
            .parquet(self.args("output"))

        # 9. sequence packing (optional): concat whole docs into
        # fixed-token training sequences, written alongside the corpus
        pack = self.args.getOrElse("pack-tokens", "")
        if pack:
            seqs = sampling.pack_sequences(
                out.where(F.col("split") == "train"), "text", "doc_id",
                seq_tokens=int(pack))
            seqs.write.mode("overwrite").parquet(
                self.args("output").rstrip("/") + "_train_sequences")

        # 9b. snapshot diff (optional): added/removed/changed/unchanged
        # per doc vs the previous run's corpus — the audit artifact a
        # recurring refresh publishes next to the data. Reads the corpus
        # just written (free checkpoint) so the diff never recomputes the
        # pipeline.
        prev = self.args.getOrElse("prev-corpus", "")
        if prev:
            cur = self.spark.read.parquet(self.args("output"))
            dedup.corpus_diff(self.spark.read.parquet(prev), cur,
                              "doc_id") \
                .write.mode("overwrite").parquet(
                    self.args("output").rstrip("/") + "_diff")

        # 10. drift report (optional): one-row unigram-KL summary of how
        # far the kept corpus drifted from the raw input — the monitoring
        # artifact a recurring pipeline run alerts on
        if self.args.boolean("drift-report"):
            kept_final = self.spark.read.parquet(self.args("output"))
            lm.corpus_divergence(raw, kept_final, "text") \
                .write.mode("overwrite").parquet(
                    self.args("output").rstrip("/") + "_drift")
