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
    # model derives from doc_tok (sum of occ ≡ direct count), NOT from a
    # second explode of ex: the shared aggregate subtree becomes a
    # ReusedExchange, so the corpus is scanned and tokenized ONCE — at
    # 100 TB the second scan+explode was the dominant cost
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
    toks = tokenize(F.col(text_col))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("w1"),
                           F.element_at(toks, i + 1).alias("w2")))
    ex = (df.where(F.size(toks) >= 2)
          .select(F.col(id_col), F.explode(pairs).alias("bg"))
          .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")))
    doc_bg = ex.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("occ"))
    # pair model re-aggregates doc_bg (sum of occ ≡ direct count) instead
    # of re-exploding the corpus — the shared subtree becomes a
    # ReusedExchange: one bigram scan+explode instead of two (the vocab
    # count below still needs its own unigram explode; V covers tokens of
    # 1-token docs that the bigram stream never sees)
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
