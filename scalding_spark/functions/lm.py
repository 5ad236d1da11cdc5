"""Self-trained n-gram language-model scoring for corpus quality filtering.

The classic cheap perplexity proxy for training-data pipelines: train token
(or conditional bigram) statistics on the corpus itself in one aggregation
pass, then score every document by its mean negative log-probability. Low
scores ≈ ordinary text; high scores ≈ gibberish / boilerplate-saturated /
off-distribution documents. No reference analog (SURVEY §6 training-data
extension) — the shapes follow the engine's own top_word_fraction pattern.

Scale contract: every shuffle carries (id, token-hash-sized) rows after a
map-side partial aggregation — never one row per token OCCURRENCE. The
model join keys on the token; hot tokens ("the") are the skew risk, which
AQE skew-join splits — and since the model side is (token, count), the
model row for a hot token is ONE row, so replicating it across splits is
free. Corpus-level scalars (total tokens, vocab size) ride a 1-row
broadcast cross join, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalding_spark.session import materialize

from scalding_spark.functions.text import tokenize


def unigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus unigram model: (tok, cnt). One explode + one combinable
    count — the shuffle carries one row per distinct token per partition
    (map-side combine), not per occurrence."""
    return (df.select(F.explode(tokenize(F.col(text_col))).alias("tok"))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))


def _avg_neg_logp(scored: DataFrame, id_col: str, occ_count_alias: str,
                  term_decimals: int | None) -> DataFrame:
    """Shared per-doc weighted mean of ``neg_logp`` weighted by ``occ``.

    ``term_decimals`` switches on the engine-portable deterministic mode:
    each term's neg_logp is rounded to that many decimals and accumulated
    as an exact integer (the same fixed-point trick the TPC-H money sums
    use), so the mean is independent of float summation order — byte-stable
    across partitionings AND across engines. ``None`` keeps full doubles.
    """
    if term_decimals is None:
        avg = F.sum(F.col("occ") * F.col("neg_logp")) / F.sum("occ")
    else:
        m = 10 ** term_decimals
        fixed = F.round(F.col("neg_logp") * m).cast("bigint")
        avg = F.sum(F.col("occ") * fixed) / (F.lit(float(m)) * F.sum("occ"))
    return (scored.groupBy(id_col)
            .agg(F.sum("occ").alias(occ_count_alias),
                 avg.alias("avg_neg_logp")))


def unigram_lm_score(df: DataFrame, text_col: str, id_col: str,
                     add_k: float = 0.5,
                     term_decimals: int | None = None) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    add-k-smoothed unigram LM.

    p(w) = (c(w) + k) / (N + k·V)   [N total tokens, V distinct tokens]

    Plan: doc-term counts (map-side combined) → join the unigram model on
    tok → weighted mean per doc. Rows shuffled: one per distinct (doc, tok)
    and one per distinct tok — both far below token occurrences.

    Returns (id_col, n_toks, avg_neg_logp); docs with no tokens are absent
    (no tokens ⇒ no probability to average). ``term_decimals`` — see
    :func:`_avg_neg_logp` (portable fixed-point accumulation).
    """
    ex = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok"))
    doc_tok = ex.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("occ"))
    # doc_tok feeds BOTH the model aggregation and the scoring join; lazy
    # localCheckpoint materializes it once — without it the corpus is
    # scanned+tokenized+aggregated twice (pyspark 4.1 does NOT stitch the
    # shared subtree into a ReusedExchange here — verified empirically),
    # and at 100 TB the second scan+explode is the dominant cost. Stored:
    # (id, tok, occ) — distinct-terms-sized, far below token occurrences.
    doc_tok = materialize(doc_tok, eager=False)
    model = doc_tok.groupBy("tok").agg(F.sum("occ").alias("cnt"))
    scalars = model.agg(F.sum("cnt").alias("N"),
                        F.count(F.lit(1)).alias("V"))
    scored = (doc_tok.join(model, "tok")
              .join(F.broadcast(scalars))  # 1-row scalar ride-along
              .withColumn("neg_logp",
                          -F.log((F.col("cnt") + F.lit(add_k))
                                 / (F.col("N") + F.lit(add_k) * F.col("V")))))
    return _avg_neg_logp(scored, id_col, "n_toks", term_decimals)


def bigram_lm_score(df: DataFrame, text_col: str, id_col: str,
                    add_k: float = 0.5,
                    term_decimals: int | None = None) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    add-k-smoothed conditional bigram LM.

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1·) + k·V)

    where c(w1·) counts w1 occurrences WITH a successor (so the conditional
    distribution sums to 1 over the vocab) and V is the distinct-unigram
    vocabulary. Documents shorter than 2 tokens are absent.

    Same shuffle discipline as :func:`unigram_lm_score`: doc-bigram counts
    and the two model tables are all map-side combined before their
    exchanges; the final probability join keys on the bigram's first token
    (prefix counts) and the bigram itself (pair counts).
    """
    from scalding_spark.functions.text import let_bound
    toks = tokenize(F.col(text_col))
    # let-bound: inlining `toks` into the pair lambda re-tokenizes the doc
    # once per bigram — O(n²) per row (see text.let_bound)
    pairs = let_bound(toks, lambda t: F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))),
        lambda i: F.struct(F.element_at(t, i).alias("w1"),
                           F.element_at(t, i + 1).alias("w2"))))
    ex = (df.where(F.size(toks) >= 2)
          .select(F.col(id_col), F.explode(pairs).alias("bg"))
          .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")))
    doc_bg = ex.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("occ"))
    # doc_bg feeds the pair model, the prefix model, AND the scoring join —
    # lazy localCheckpoint materializes the bigram scan+explode once (see
    # unigram_lm_score: pyspark 4.1 does not ReusedExchange the shared
    # subtree). The vocab count below still needs its own unigram explode;
    # V covers tokens of 1-token docs the bigram stream never sees.
    doc_bg = materialize(doc_bg, eager=False)
    pair_model = doc_bg.groupBy("w1", "w2").agg(F.sum("occ").alias("pair_cnt"))
    prefix_model = pair_model.groupBy("w1").agg(F.sum("pair_cnt").alias("prefix_cnt"))
    vocab = (df.select(F.explode(tokenize(F.col(text_col))).alias("tok"))
             .agg(F.count_distinct("tok").alias("V")))
    scored = (doc_bg.join(pair_model, ["w1", "w2"])
              .join(prefix_model, "w1")
              .join(F.broadcast(vocab))
              .withColumn("neg_logp",
                          -F.log((F.col("pair_cnt") + F.lit(add_k))
                                 / (F.col("prefix_cnt") + F.lit(add_k) * F.col("V")))))
    return _avg_neg_logp(scored, id_col, "n_bigrams", term_decimals)


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public method)
# ---------------------------------------------------------------------------

def hashed_ngram_features(df: DataFrame, text_col: str, id_col: str,
                          n_buckets: int = 8192,
                          use_bigrams: bool = True,
                          portable_hash: bool = True) -> DataFrame:
    """Per-doc hashed bag-of-n-grams counts — DSIR's feature map: unigrams
    (+ bigrams) hashed into ``n_buckets`` buckets. Returns
    (id_col, bucket, occ), map-side combined before its one exchange.

    ``portable_hash=True`` buckets via md5 (any engine reproduces the exact
    features — the selection is a dataset contract, same rationale as
    sampling.hash_bucket); ``False`` uses xxhash64 (~3× faster, JVM-only).
    """
    from scalding_spark.functions.text import ngrams
    toks = tokenize(F.col(text_col))
    feats = F.concat(toks, ngrams(F.col(text_col), 2)) if use_bigrams else toks
    ex = df.select(F.col(id_col), F.explode(feats).alias("__f"))
    if portable_hash:
        h = F.conv(F.substring(F.md5(F.col("__f")), 1, 8), 16, 10).cast("bigint")
    else:
        h = F.xxhash64(F.col("__f"))
    b = F.pmod(h, F.lit(n_buckets))
    return (ex.select(F.col(id_col), b.alias("bucket"))
            .groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("occ")))


def importance_weights(raw: DataFrame, target: DataFrame, text_col: str,
                       id_col: str, n_buckets: int = 8192,
                       add_k: float = 0.5, use_bigrams: bool = True,
                       term_decimals: int | None = None,
                       portable_hash: bool = True) -> DataFrame:
    """DSIR importance weight per raw document:
    ``log p_target(x) − log p_raw(x)`` under add-k-smoothed multinomials
    over hashed n-gram buckets. High weight ≈ looks like the target
    distribution (curated text), low ≈ off-distribution.

    Decomposition keeps everything one-pass: the per-bucket part
    ``λ(b) = ln(c_t(b)+k) − ln(c_r(b)+k)`` joins on bucket; the
    normalizer part ``ln(N_r+kB) − ln(N_t+kB)`` is a 1-row scalar
    multiplied by the doc's feature count. The λ table has ≤ ``n_buckets``
    rows — it BROADCASTS, so raw-side feature counts never reshuffle for
    the model join (the 100 TB property: one exchange on (id, bucket),
    everything after is map-side).

    ``term_decimals`` (engine-portable mode): λ(b) and the normalizer are
    rounded to that many decimals and accumulated as exact integers —
    output column ``lw_fixed`` (bigint, scaled by 10^term_decimals) is
    bit-identical across engines and partitionings. Full-double
    ``log_weight`` is always emitted.

    Returns (id_col, n_feats, log_weight[, lw_fixed]).
    """
    fr = hashed_ngram_features(raw, text_col, id_col, n_buckets,
                               use_bigrams, portable_hash)
    # the raw feature table feeds BOTH the model (via model_r → λ, norm)
    # and the per-doc weight join; without materialization the corpus is
    # tokenized+hashed+aggregated twice (the broadcast build is a separate
    # job, so ReusedExchange cannot stitch across it). Lazy localCheckpoint:
    # computed once on first use, stored as (id, bucket, occ) — far smaller
    # than the text it derives from — reused everywhere after.
    fr = materialize(fr, eager=False)
    ft = hashed_ngram_features(target, text_col, id_col, n_buckets,
                               use_bigrams, portable_hash)
    model_r = fr.groupBy("bucket").agg(F.sum("occ").alias("c_r"))
    # model_t feeds both λ and the N_t scalar — checkpoint the ≤n_buckets-row
    # table so the target corpus is scanned once, not twice
    model_t = materialize(
        ft.groupBy("bucket").agg(F.sum("occ").alias("c_t")), eager=False)
    # raw docs' buckets ⊆ model_r's buckets by construction; target-absent
    # buckets smooth to k via coalesce
    lam_tbl = (model_r.join(model_t, "bucket", "left")
               .select("bucket",
                       (F.log(F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(add_k))
                        - F.log(F.col("c_r") + F.lit(add_k))).alias("lam")))
    n_r = model_r.agg(F.sum("c_r").alias("N_r"))
    n_t = model_t.agg(F.sum("c_t").alias("N_t"))
    kb = F.lit(add_k * n_buckets)
    norm = (n_r.crossJoin(n_t)
            .select((F.log(F.col("N_r") + kb) - F.log(F.col("N_t") + kb))
                    .alias("norm")))
    j = fr.join(F.broadcast(lam_tbl), "bucket").join(F.broadcast(norm))
    if term_decimals is None:
        return (j.groupBy(id_col)
                .agg(F.sum("occ").alias("n_feats"),
                     (F.sum(F.col("occ") * F.col("lam"))
                      + F.sum("occ") * F.first("norm")).alias("log_weight")))
    m = 10 ** term_decimals
    lam_i = F.round(F.col("lam") * m).cast("bigint")
    norm_i = F.round(F.col("norm") * m).cast("bigint")
    return (j.groupBy(id_col)
            .agg(F.sum("occ").alias("n_feats"),
                 (F.sum(F.col("occ") * lam_i)
                  + F.sum("occ") * F.first(norm_i)).alias("lw_fixed"))
            .withColumn("log_weight", F.col("lw_fixed") / F.lit(float(m))))


def importance_resample(raw: DataFrame, target: DataFrame, text_col: str,
                        id_col: str, k: int, n_buckets: int = 8192,
                        add_k: float = 0.5, use_bigrams: bool = True,
                        salt: str = "dsir",
                        portable_hash: bool = True) -> DataFrame:
    """Select ``k`` raw documents by Gumbel-top-k over the importance
    weights — equivalent to sampling k docs WITHOUT replacement with
    probability ∝ p_target/p_raw (the DSIR selection rule), but fully
    deterministic: the Gumbel noise derives from md5(salt‖id), so the same
    (corpus, target, salt) always selects the same ids on any engine.

    Plan: weights (above) → score = log_weight + Gumbel(md5-uniform) →
    global top-k, which Spark plans as TakeOrderedAndProject (per-partition
    heaps + driver merge of k rows — no global sort) → semi-join back to
    the raw rows. Returns the selected raw rows plus ``log_weight``.
    """
    from scalding_spark.functions.sampling import hash_bucket
    w = importance_weights(raw, target, text_col, id_col, n_buckets,
                           add_k, use_bigrams, None, portable_hash)
    # u ∈ (0,1) strictly: (bucket + 0.5) / 2^32 — both log() calls finite
    u = (hash_bucket(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(1 << 32))
    score = F.col("log_weight") - F.log(-F.log(u))
    picked = (w.select(id_col, "log_weight", score.alias("__score"))
              .orderBy(F.col("__score").desc(), id_col).limit(k)
              .drop("__score"))
    return raw.join(picked, id_col)


def perplexity_buckets(df: DataFrame, text_col: str, id_col: str,
                       fractions: tuple[float, ...] = (1 / 3, 2 / 3),
                       labels: tuple[str, ...] = ("head", "middle", "tail"),
                       add_k: float = 0.5,
                       term_decimals: int | None = 6) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, CCNet): score
    every document with the corpus's own unigram LM, order by score
    ascending (low = most LM-ordinary), and label the first
    ``fractions[0]`` of docs ``head``, the next slice ``middle``, ... —
    the standard head/middle/tail quality split used to curriculum-filter
    web corpora.

    Cut points are EXACT doc counts (``floor(n * f)``), not approximate
    quantiles: the global ordering uses the parallel range-partition rank
    (``Pipe.rank_by`` — no single-task window), ties broken by ``id_col``,
    so membership is deterministic on any engine and any partitioning
    (scores use the fixed-point ``term_decimals`` accumulation — see
    :func:`_avg_neg_logp`).

    Returns the scored rows: (id_col, n_toks, avg_neg_logp, bucket).
    Docs with no tokens are absent (same contract as the scorer).

    Scale: one corpus scan for the LM + scoring (see unigram_lm_score),
    one range exchange of (id, score) rows for the rank, and a broadcast
    of the #partitions-row offset table — nothing keys on a hot value.
    """
    if len(labels) != len(fractions) + 1:
        raise ValueError(
            f"need len(labels) == len(fractions)+1, got {len(labels)} labels "
            f"for {len(fractions)} fractions")
    if list(fractions) != sorted(fractions) or not all(
            0.0 < f < 1.0 for f in fractions):
        raise ValueError(f"fractions must be ascending in (0,1): {fractions}")
    from scalding_spark.pipe import Pipe
    scored = unigram_lm_score(df, text_col, id_col, add_k, term_decimals)
    ranked = (Pipe(scored)
              .rank_by(F.col("avg_neg_logp"), F.col(id_col), rank_col="__rk")
              .to_df())
    # ranked feeds BOTH the total-count broadcast and the join; without a
    # materialization the whole LM-score + rank lineage runs twice (the
    # broadcast build is a separate job — no ReusedExchange, see
    # test_shared_count_tables_scan_corpus_once). Stored rows: one per doc.
    ranked = materialize(ranked, eager=False)
    n = F.count(F.lit(1)).alias("__n")
    total = F.broadcast(ranked.agg(n))  # 1-row scalar ride-along
    # EXACT integer cut test: rk <= floor(n·num/den)  ⟺  rk·den <= n·num.
    # floor(n * float(f)) is engine-dependent for non-dyadic f — fuzz-axis
    # finding: 207·float(1/3) rounds UP to exactly 69.0 in binary double
    # (floor 69) while exact decimal arithmetic gives 68.9999... (floor
    # 68); rational comparison is exact on every engine. Fraction(...)
    # recovers the intended ratio (1/3, not the float's 2^-52 garble);
    # den ≤ 1e6 keeps n·num inside bigint for corpora up to ~9e12 rows.
    from fractions import Fraction
    bucket = None
    for f, lab in zip(fractions, labels):
        fr = Fraction(float(f)).limit_denominator(1_000_000)
        cond = (F.col("__rk") * F.lit(fr.denominator)
                <= F.col("__n") * F.lit(fr.numerator))
        bucket = F.when(cond, lab) if bucket is None else bucket.when(cond, lab)
    bucket = bucket.otherwise(labels[-1])
    return (ranked.join(total)
            .withColumn("bucket", bucket)
            .drop("__rk", "__n"))


def corpus_divergence(df_a: DataFrame, df_b: DataFrame, text_col: str,
                      add_k: float = 0.5,
                      term_decimals: int | None = 9) -> DataFrame:
    """Unigram-distribution divergence between two corpora — the cheap
    domain-shift / contamination-drift detector (is my new crawl batch
    distributed like my curated corpus?).

    Both corpora get add-k-smoothed unigram models over the UNION
    vocabulary (so every token has nonzero mass on both sides and the KL
    terms are finite). Returns ONE row:
    (n_toks_a, n_toks_b, vocab, kl_ab, kl_ba, jsd_proxy) with
    kl_ab = Σ p_a·ln(p_a/p_b) in nats and jsd_proxy = (kl_ab+kl_ba)/2
    (the symmetrized KL, not the true JSD — no mixture model pass).

    Plan: one count aggregation per corpus (map-side combined), a full
    outer join on the token, scalars on a 1-row broadcast, and a keyless
    partial-aggregated sum — nothing shuffles per occurrence.
    ``term_decimals`` applies the engine-portable fixed-point trick to
    each KL term (see :func:`_avg_neg_logp`).
    """
    ca = unigram_counts(df_a, text_col).withColumnRenamed("cnt", "ca")
    cb = unigram_counts(df_b, text_col).withColumnRenamed("cnt", "cb")
    j = (ca.join(cb, "tok", "full_outer")
         .select(F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    # j feeds the scalar broadcast AND the term sum — materialize the
    # joined count table once (vocab-sized rows) instead of running both
    # corpus scans + the outer join twice (no ReusedExchange across the
    # broadcast-build job boundary)
    j = materialize(j, eager=False)
    scalars = F.broadcast(j.agg(F.sum("ca").alias("na"),
                                F.sum("cb").alias("nb"),
                                F.count(F.lit(1)).alias("v")))
    k = F.lit(float(add_k))
    w = j.join(scalars)
    pa = (F.col("ca") + k) / (F.col("na") + k * F.col("v"))
    pb = (F.col("cb") + k) / (F.col("nb") + k * F.col("v"))
    t_ab = pa * F.log(pa / pb)
    t_ba = pb * F.log(pb / pa)
    if term_decimals is not None:
        m = 10 ** term_decimals
        # fixed-point per-term rounding: 9 decimals (not the usual 6) —
        # per-token KL terms scale like 1/vocab, so a coarser grid would
        # zero the long tail and bias the sum; at 1e9 the total stays far
        # inside bigint range (sum of |t| is bounded by the KLs themselves)
        fx = lambda t: F.round(t * m).cast("bigint")  # noqa: E731
        kl_ab = F.sum(fx(t_ab)) / F.lit(float(m))
        kl_ba = F.sum(fx(t_ba)) / F.lit(float(m))
    else:
        kl_ab, kl_ba = F.sum(t_ab), F.sum(t_ba)
    return (w.agg(F.max("na").alias("n_toks_a"),
                  F.max("nb").alias("n_toks_b"),
                  # empty corpora: w has no rows, but the vocabulary SIZE
                  # is still a count — 0, not NULL (SQL count semantics;
                  # token totals stay NULL like any sum over nothing)
                  F.coalesce(F.max("v"), F.lit(0).cast("bigint"))
                  .alias("vocab"),
                  kl_ab.alias("kl_ab"),
                  kl_ba.alias("kl_ba"))
            .withColumn("jsd_proxy",
                        (F.col("kl_ab") + F.col("kl_ba")) / F.lit(2.0)))
