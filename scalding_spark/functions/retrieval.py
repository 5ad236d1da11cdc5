"""BM25 ranked retrieval over a document corpus.

The classic relevance function a data-pipeline engine needs next to TF-IDF
(q_tfidf_top_terms): score documents against a (small) query term set with
Okapi BM25 and return the top-k. No reference analog (the reference stops at
TF-IDF-style joins); shapes follow the engine's own LM-scoring pattern
(lm.py) — map-side-combined counts, 1-row scalar broadcast, fixed-point
term accumulation for engine-portable hashing.

Scale contract (100 TB corpus, O(10) query terms):
- tokens are FILTERED to the query-term set before any exchange — the
  (doc, term) shuffle carries only matching rows, a ~|query| multiple of
  the matching-doc count, never one row per corpus token;
- document length is computed as a map-only expression next to the scan;
- corpus scalars (N, total length) and per-term document frequencies are
  one broadcast row and ≤|query| broadcast rows respectively;
- the final top-k is a TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scalding_spark.session import materialize

from scalding_spark.functions.text import tokenize


def bm25_rank(df: DataFrame, query_terms: list[str],
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75, k: int = 10,
              term_decimals: int | None = None) -> DataFrame:
    """Top-k documents by Okapi BM25 against ``query_terms``.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

    ``term_decimals`` switches on the portable fixed-point mode: each term's
    contribution is rounded to that many decimals and summed as an exact
    integer, so the score — and the top-k ORDER-BY cut, which sorts the
    integer — is independent of float summation order and identical across
    engines. Ties break on ascending ``id_col``.

    Returns (id_col, n_match_terms, score); docs matching no query term are
    absent (their score is 0).
    """
    terms = sorted(set(query_terms))
    term_arr = F.array(*[F.lit(t) for t in terms])
    toks = tokenize(F.col(text_col))
    # doc length from ALL tokens (map-only), token stream filtered to query
    # terms BEFORE the explode+agg — the only per-doc shuffle rows are hits
    hits = (df.select(F.col(id_col), F.size(toks).alias("dl"),
                      F.explode(F.filter(toks,
                                lambda t: F.array_contains(term_arr, t)))
                       .alias("term")))
    tf = (hits.groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    # tf feeds BOTH the scored join and the broadcast df(t) build; lazy
    # localCheckpoint materializes the corpus scan+filter once (pyspark 4.1
    # does not ReusedExchange across the broadcast-build job boundary —
    # same empirical finding as lm.py). Stored rows: query-term hits only.
    tf = materialize(tf, eager=False)
    # N and total length come from a separate map-only agg (it must see ALL
    # docs' lengths, not just hits — one full scan is inherent)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = df.select(F.size(toks).alias("dl")).agg(
        F.count(F.lit(1)).alias("N"), F.sum("dl").alias("sum_dl"))
    idf = F.log(F.lit(1.0) + (F.col("N") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    # avgdl enters as dl·N/sum_dl — exact-integer operands, one double div
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") * F.col("N") / F.col("sum_dl"))
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(F.broadcast(scalars))
              .withColumn("contrib", contrib))
    if term_decimals is None:
        agg = scored.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_match_terms"),
            F.sum("contrib").alias("score"))
        return (agg.orderBy(F.col("score").desc(), id_col).limit(k))
    m = 10 ** term_decimals
    fixed = F.round(F.col("contrib") * m).cast("bigint")
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_match_terms"),
        F.sum(fixed).alias("score_fixed"))
    return (agg.orderBy(F.col("score_fixed").desc(), id_col).limit(k)
            .select(id_col, "n_match_terms",
                    (F.col("score_fixed") / F.lit(float(m))).alias("score")))
