"""Text-analysis operators for large-scale training-data pipelines.

All hot-path operators are Column expressions (JVM-side, codegen) — no Python
UDFs — so they hold up on a 100 TB documents table: tokenization and scoring
are embarrassingly parallel per row, with no shuffle at all.

The reference's analog is free-form lambdas over lines (e.g. the WordCount
tokenizer, README.md:14-31); these are the engine-native, SQL-oracle-checkable
versions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scalding_spark.session import materialize

# Tiny per-language stopword inventories for the n-gram/stopword language-id
# heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por", "con", "para"],
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(col: Column) -> Column:
    """Lowercase word tokens; empty tokens filtered. Mirrors the WordCount
    tokenizer contract (reference README.md:14-31)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def let_bound(value: Column, body) -> Column:
    """Let-binding for expression pipelines: evaluate ``value`` ONCE per row
    and hand it to ``body`` as a bound lambda variable.

    Why it exists: Spark's interpreted higher-order functions re-evaluate
    any expression INLINED into the per-element lambda for every element.
    ``transform(seq(1,n), i -> slice(tokenize(text), i, k))`` therefore
    re-tokenizes the document once per gram — O(n²) per row (measured: the
    n-gram explode over 300-token docs ran 10×+ slower; winnowing was
    quadratic to the point of unrunnable). ``transform`` over a one-element
    array evaluates the element expression exactly once and the lambda sees
    it as an O(1) variable reference; ``get(..., 0)`` unwraps the result.
    """
    return F.get(F.transform(F.array(value), body), 0)


def token_count(col: Column) -> Column:
    """Whitespace/punct token count — the cheap pre-BPE budget estimate."""
    return F.size(tokenize(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximating token estimate: words + digits + punctuation runs
    each count; long words count ceil(len/6) subword units. Pure expression."""
    words = tokenize(col)
    subwords = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(6.0)).cast("int"))
    punct = F.length(F.regexp_replace(col, "[a-zA-Z0-9\\s]+", ""))
    return (subwords + punct).alias("bpe_tokens")


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, "[a-zA-Z0-9\\s]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords (counting duplicates)."""
    toks = tokenize(col)
    stops = F.array([F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    n = F.size(toks)
    return F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    healthy stopword density. Deterministic, expression-only."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) < 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(col) > 0.05, 1.0).otherwise(0.0)
    return ((len_ok + punct_ok + stop_ok) / F.lit(3.0))


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language evidence: number of DISTINCT stopwords present.
    Distinctness makes the score order-insensitive and engine-portable."""
    toks = tokenize(col)
    out = {}
    for lang, words in STOPWORDS.items():
        stops = F.array([F.lit(w) for w in words])
        out[lang] = F.size(F.array_distinct(
            F.filter(toks, lambda t: F.array_contains(stops, t))))
    return out


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic tie-break (language name asc,
    'und' when no evidence, NULL for NULL text — 'und' means "inspected,
    no stopword evidence"; an absent document was never inspected, and
    SQL expressions over NULL text yield NULL)."""
    scores = lang_scores(col)
    pairs = F.array(*[F.struct(s.alias("score"), F.lit(lang).alias("lang"))
                      for lang, s in sorted(scores.items())])
    # max by (score, reversed-lang) with stable smallest-lang-wins tie-break:
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc))
    return F.when(col.isNull(), F.lit(None).cast("string")) \
            .when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def normalize_for_fingerprint(col: Column) -> Column:
    """Canonical form for content fingerprinting: lowercase, collapse
    whitespace/punct runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def fingerprint64(col: Column) -> Column:
    """64-bit content fingerprint of the normalized text (xxhash64 — one
    JVM-side hash, the engine's analog of a rolling-hash document id).

    NULL in → NULL out: xxhash64 SKIPS null inputs and returns the bare
    seed hash, so without the guard every null document would share one
    constant fingerprint — silently deduplicating unrelated null rows and
    inflating distinct counts vs any SQL engine (md5/count(distinct)
    null-propagate there). Null fingerprints fall out of equi-joins and
    count_distinct identically on both engines."""
    return F.when(col.isNotNull(),
                  F.xxhash64(normalize_for_fingerprint(col)))


# PII patterns — RE2/Java-regex portable (no lookaround/backrefs) so the same
# pattern string runs in Spark and in SQL oracles. The redaction CASCADE order
# is part of the contract: email → ipv4 → phone (IPs are redacted before the
# phone pass so dotted digit runs aren't mis-tagged as phone numbers).
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_IPV4_RE = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PII_PHONE_RE = "\\+?[0-9][0-9() .-]{6,}[0-9]"


def pii_redact(col: Column) -> Column:
    """Replace emails/IPv4s/phone-ish digit runs with typed placeholder
    tokens. Pure JVM-side regexp cascade — no UDF, scales linearly."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(col: Column) -> Column:
    """struct(emails, ips, phones) match counts, counted along the same
    cascade as :func:`pii_redact` (phone counted after email/IP removal)."""
    after_email = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    return F.struct(
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0)).alias("emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(PII_IPV4_RE), 0)).alias("ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PII_PHONE_RE), 0)).alias("phones"))


def top_word_fraction(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signal: count of the most frequent token over
    the total token count (Gopher-style repetition filter input).

    Scale: explode + two combinable aggs — the (id, token) partial agg
    happens map-side, so the shuffle carries one row per distinct token per
    doc, not one per token occurrence.
    Returns (id_col, top_cnt, n_toks, top_word_frac)."""
    ex = df.select(id_col, F.explode(tokenize(F.col(text_col))).alias("tok"))
    cnt = ex.groupBy(id_col, "tok").agg(F.count("*").alias("cnt"))
    return (cnt.groupBy(id_col)
            .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_toks"))
            .withColumn("top_word_frac",
                        F.col("top_cnt").cast("double") / F.col("n_toks")))


def ngrams(col: Column, n: int = 2) -> Column:
    """Word n-gram array WITH duplicates (contrast :func:`shingles`, which
    dedups for set-similarity): the unit stream for repetition measurement,
    where multiplicity IS the signal. Expression-only sliding join; docs with
    fewer than ``n`` tokens yield an empty array (no partial grams, so every
    gram covers exactly ``n`` tokens and gram counts are comparable across
    docs)."""
    def build(toks: Column) -> Column:
        k = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
        grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))
    # let-bound tokens: inlining tokenize into the per-gram lambda would
    # re-tokenize once PER GRAM — O(n²) per doc (see let_bound)
    return let_bound(tokenize(col), build)


def top_ngram_fraction(df, text_col: str = "text", id_col: str = "doc_id",
                       n: int = 2):
    """Per-document n-gram repetition signal (the Gopher repetition-filter
    family generalized beyond single tokens): count of the most frequent
    word n-gram over the total n-gram count. n=1 degenerates to
    :func:`top_word_fraction`.

    Scale: same shape as top_word_fraction — explode + two combinable aggs.
    The (id, gram) partial agg is map-side, so the exchange carries one row
    per DISTINCT gram per doc; gram strings are bounded (n tokens), and at
    100 TB the group key can be swapped for xxhash64(gram) without changing
    the counts (collision-negligible), shrinking the shuffle to 16 B/row.
    Docs with < n tokens produce no row (no grams to measure).
    Returns (id_col, top_cnt, n_grams, top_ngram_frac)."""
    ex = df.select(id_col, F.explode(ngrams(F.col(text_col), n)).alias("gram"))
    cnt = ex.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    return (cnt.groupBy(id_col)
            .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_grams"))
            .withColumn("top_ngram_frac",
                        F.col("top_cnt").cast("double") / F.col("n_grams")))


# Gopher-style document-quality rule thresholds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", Table A1 — adapted: our tokenizer is
# alnum-run based, so the "80% of words contain an alphabetic character"
# rule becomes a cap on all-digit tokens). All rules are integer
# cross-multiplications — no float division anywhere — so the pass/fail bit
# is bit-identical on any engine.
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3   # 3 <= total_chars / n_toks <= 10
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MAX_NUMERIC_FRAC = (1, 5)    # n_numeric / n_toks <= 1/5
GOPHER_MIN_STOPWORD_FRAC = (1, 50)  # n_stop / n_toks >= 1/50  (>=2%)


def gopher_signals(col: Column, lang: str = "en") -> dict[str, Column]:
    """The integer signal vector behind :func:`gopher_pass`: token count,
    total token chars, distinct tokens, all-digit tokens, stopword tokens.
    Pure expressions (map-only, fuse into the scan); every signal is an
    exact integer so downstream thresholds never touch float rounding."""
    toks = tokenize(col)
    stops = F.array([F.lit(w) for w in STOPWORDS[lang]])
    return {
        "n_toks": F.size(toks),
        "total_chars": F.aggregate(toks, F.lit(0),
                                   lambda a, t: a + F.length(t)),
        "n_distinct": F.size(F.array_distinct(toks)),
        "n_numeric": F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))),
        "n_stop": F.size(F.filter(toks, lambda t: F.array_contains(stops, t))),
    }


def gopher_pass(col: Column, lang: str = "en") -> Column:
    """Gopher-style quality gate as ONE boolean expression: length band,
    mean-word-length band, numeric-token cap, stopword floor — all integer
    cross-multiplied (``3*n <= chars <= 10*n`` instead of ``3 <= chars/n``),
    so the bit is engine-exact. Word-soup corpora (no sentences) keep the
    four rules meaningful; the line-level Gopher rules live in
    :func:`duplicate_line_fraction` / :func:`top_ngram_fraction`."""
    s = gopher_signals(col, lang)
    n, chars = s["n_toks"], s["total_chars"]
    num_n, num_d = GOPHER_MAX_NUMERIC_FRAC
    stop_n, stop_d = GOPHER_MIN_STOPWORD_FRAC
    return ((n >= GOPHER_MIN_TOKENS) & (n <= GOPHER_MAX_TOKENS)
            & (chars >= F.lit(GOPHER_MIN_MEAN_WORD_LEN) * n)
            & (chars <= F.lit(GOPHER_MAX_MEAN_WORD_LEN) * n)
            & (s["n_numeric"] * F.lit(num_d) <= n * F.lit(num_n))
            & (s["n_stop"] * F.lit(stop_d) >= n * F.lit(stop_n)))


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) — the unit set for Jaccard/MinHash
    dedup. Expression-only: sliding join over the token array."""
    def build(toks: Column) -> Column:
        k = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
        grams = F.transform(idx,
                            lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        return F.when(k >= n, F.array_distinct(grams)).otherwise(
            F.when(k > 0, F.array(F.array_join(toks, " ")))
            .otherwise(F.array().cast("array<string>")))
    return let_bound(tokenize(col), build)  # O(n), not O(n²) — see let_bound


# Default logistic quality-scorer weights: hand-set, documented magnitudes —
# the OPERATOR contract is "broadcast linear model over expression features";
# production swaps in trained weights without touching the plan.
QUALITY_MODEL_WEIGHTS = {
    "log_n_tok": 0.9,       # longer docs mildly favored (log-scaled)
    "punct_ratio": -6.0,    # symbol soup penalized
    "stop_ratio": 4.0,      # healthy function-word density favored
    "mean_word_len": -0.35, # very long average tokens ≈ code/URLs/gibberish
}
QUALITY_MODEL_BIAS = -1.0


def quality_features(col: Column) -> dict[str, Column]:
    """The expression-only feature vector for :func:`linear_quality_score`.
    Every feature is a pure Column (whole-stage-codegen'd, no UDF); features
    needing corpus statistics (e.g. top_word_fraction) are deliberately
    excluded — they're per-doc aggregates to join in upstream if wanted."""
    toks = tokenize(col)
    n = F.size(toks)
    mean_wl = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n
    ).otherwise(F.lit(0.0))
    return {
        "log_n_tok": F.log(F.lit(1.0) + n),
        "punct_ratio": punct_ratio(col),
        "stop_ratio": stopword_ratio(col),
        "mean_word_len": mean_wl,
    }


def linear_quality_score(col: Column,
                         weights: dict[str, float] | None = None,
                         bias: float | None = None) -> Column:
    """Logistic quality score in [0,1]: sigmoid(bias + w·features).

    The scale-relevant property: the model is plan literals (broadcast by
    value inside the generated code), the features are Column expressions —
    scoring 100 TB is a map-only pass fused into whatever scan feeds it.
    This is the deploy shape for any linear/logistic doc-quality classifier
    (fastText-style bag-of-features models reduce to it after training)."""
    w = QUALITY_MODEL_WEIGHTS if weights is None else weights
    b = QUALITY_MODEL_BIAS if bias is None else bias
    feats = quality_features(col)
    z = F.lit(float(b))
    for name, weight in sorted(w.items()):
        z = z + F.lit(float(weight)) * feats[name]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logistic_quality(df, text_col: str, label_col,
                           lr: float = 1.0, iters: int = 3,
                           feat_decimals: int = 6, grad_decimals: int = 9,
                           stats: dict | None = None
                           ) -> tuple[dict[str, float], float]:
    """TRAIN the logistic doc-quality classifier whose deploy shape is
    :func:`linear_quality_score` — full-batch gradient descent where the
    whole per-iteration cost is ONE partial-aggregated pass over the corpus
    (no reference analog; the training half of the SURVEY §6 quality-model
    extension).

    Per iteration, entirely in Column expressions (no UDF, no collect of
    rows):

    - features quantized to ``feat_decimals`` (engine-stable inputs),
    - p = sigmoid(bias + w·f) with the SAME sorted-name left-associative
      accumulation as scoring, quantized to ``feat_decimals``,
    - per-row gradient terms (p − y)·f_j scaled by 10^``grad_decimals``
      into BIGINTs and SUMMED EXACTLY — integer sums are associative, so
      the gradient (hence the whole training trajectory) is bit-identical
      under any partition layout and across engines; the only float ops
      are per-row (IEEE-deterministic) and the k+1 driver-side updates.

    The driver receives k+1 numbers per iteration (the gradient), never
    rows — at 100 TB each iteration is one map-combined exchange of
    #partitions × (k+1) bigints. Weights re-enter the next iteration as
    plan literals; with ``iters`` ~ 3-10 the per-iteration codegen rebuild
    is noise (unlike k-means' k·dim arrays — see _assign_cells_bcast).

    Returns ``(weights, bias)``; ``stats`` gains ``n_docs`` and
    ``loss_path`` (quantized mean log-loss per iteration, same fixed-point
    contract).
    """
    fscale = float(10 ** feat_decimals)
    gscale = float(10 ** grad_decimals)
    names = sorted(QUALITY_MODEL_WEIGHTS)
    feats = quality_features(F.col(text_col))
    fq = {k: F.round(feats[k], feat_decimals) for k in names}
    y = F.col("__y")
    base = df.select(
        *[fq[k].alias(k) for k in names],
        (label_col if isinstance(label_col, Column) else F.col(label_col))
        .cast("int").alias("__y"))
    # iterative-read amortization (the kmeans persist, r09 — measured at
    # sf1: one feature pass is 3.4 s and the 3-iteration training was
    # 11.6 s ≈ 3 full re-tokenizations; with the persist, iterations 2+
    # aggregate the cached (k+1)-number rows instead of re-running the
    # tokenize/stopword/entropy expressions over the corpus text). The
    # cached row is ~7 numbers per doc — 3 orders smaller than the text
    # it replaces — and values are bit-identical (the same per-row
    # deterministic expressions, materialized once). Unpersisted before
    # returning, even when an iteration throws.
    from pyspark import StorageLevel
    base = base.persist(StorageLevel.MEMORY_AND_DISK)

    weights = {k: 0.0 for k in names}
    bias = 0.0
    loss_path: list[float] = []
    n_docs = None
    try:
        for _ in range(iters):
            z = F.lit(float(bias))
            for k in names:
                z = z + F.lit(float(weights[k])) * F.col(k)
            p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), feat_decimals)
            err = p - y.cast("double")
            aggs = [F.sum(F.round(err * gscale).cast("long")).alias("__gb")]
            aggs += [F.sum(F.round(err * F.col(k) * gscale).cast("long")).alias(f"__g_{k}")
                     for k in names]
            # mean log-loss on the same fixed-point contract (clamped away from
            # ln(0): p is quantized, so 0 and 1 are reachable)
            pc = F.least(F.greatest(p, F.lit(10.0 ** -feat_decimals)),
                         F.lit(1.0 - 10.0 ** -feat_decimals))
            ll = -(y * F.log(pc) + (1 - y) * F.log(F.lit(1.0) - pc))
            aggs += [F.sum(F.round(ll * gscale).cast("long")).alias("__ll"),
                     F.count(F.lit(1)).alias("__n")]
            row = base.agg(*aggs).collect()[0]
            n_docs = row["__n"]
            if n_docs == 0:
                # empty training slice: keep the zero-initialized model (the
                # gradient sums are NULL; there is nothing to descend on)
                break
            n = float(n_docs)
            bias = bias - lr * ((row["__gb"] / gscale) / n)
            for k in names:
                weights[k] = weights[k] - lr * ((row[f"__g_{k}"] / gscale) / n)
            loss_path.append((row["__ll"] / gscale) / n)
    finally:
        base.unpersist()
    if stats is not None:
        stats["n_docs"] = n_docs
        stats["loss_path"] = loss_path
    return weights, bias


def chunk_documents(df, text_col: str, id_col: str,
                    chunk_tokens: int = 512, overlap: int = 64):
    """Split documents into overlapping token-budget chunks — the standard
    context-window prep for training/embedding pipelines. Map-only: one
    expression pass computing chunk starts + one posexplode; no shuffle, no
    UDF, fuses into the scan (the 100 TB shape: chunking is free next to
    the read).

    Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the last chunk starts at the final
    stride multiple that still exposes new tokens, so every token lands in
    ≥1 chunk and consecutive chunks share exactly ``overlap`` tokens
    (except a shorter tail). Token-less docs yield no rows.

    Returns (id_col, chunk_id, chunk_text, n_tokens) where chunk_text is
    the space-joined normalized tokens (a TOKEN-budget contract; pipelines
    needing byte-exact sub-strings should slice raw offsets instead).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        # negative overlap would make stride exceed the chunk size and
        # silently skip tokens between chunks — breaking the every-token-
        # covered contract without an error
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap

    def build(toks: Column) -> Column:
        # let-bound (see let_bound): inlined, the chunk lambda would
        # re-tokenize the doc once per chunk — O(n²/stride) per row
        n = F.size(toks)
        # 1 + ceil(max(n - chunk_tokens, 0) / stride), exact integer math
        n_chunks = (F.lit(1) +
                    F.floor((F.greatest(n - chunk_tokens, F.lit(0))
                             + F.lit(stride - 1)) / F.lit(stride)).cast("int"))
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                F.array_join(F.slice(toks, i * stride + 1, chunk_tokens), " ")
                 .alias("chunk_text"),
                F.least(F.lit(chunk_tokens), n - i * stride).alias("n_tokens")))

    chunks = let_bound(tokenize(F.col(text_col)), build)
    return (df.where(F.size(tokenize(F.col(text_col))) > 0)
            .select(F.col(id_col),
                    F.posexplode(chunks).alias("chunk_id", "__c"))
            .select(id_col, "chunk_id",
                    F.col("__c.chunk_text").alias("chunk_text"),
                    F.col("__c.n_tokens").alias("n_tokens")))


def duplicate_line_fraction(col: Column, sep: str = "\\.") -> Column:
    """Within-document repetition at the line/sentence level (the Gopher
    repetition-filter family, complementing token-level top_word_fraction):
    fraction of normalized non-empty segments that are duplicates of an
    earlier segment. 0.0 for docs with ≤1 segment. Pure expression — scores
    fuse into the scan like the other quality features.

    Segments are split on ``sep`` (default: sentence-ish on '.'), then
    normalized with the fingerprint canonicalization so trivial
    punctuation/case differences still count as repeats.
    """
    segs = _norm_segments(col, sep)
    n = F.size(segs)
    dups = n - F.size(F.array_distinct(segs))
    return F.when(n > 1, dups / n).otherwise(F.lit(0.0))


def _norm_segments(col: Column, sep: str) -> Column:
    return F.filter(
        F.transform(F.split(col, sep),
                    lambda s: F.trim(F.regexp_replace(F.lower(s),
                                                      "[^a-z0-9]+", " "))),
        lambda s: s != F.lit(""))


def duplicate_line_char_fraction(col: Column, sep: str = "\\.") -> Column:
    """CHAR-weighted duplicate-segment fraction — Gopher's actual
    repetition rule is "fraction of CHARACTERS inside duplicate lines"
    (Rae et al. 2021 §A1.1), which :func:`duplicate_line_fraction`'s
    count-weighted variant under-reports when the repeats are the LONG
    segments: Σ_d (count_d − 1)·len(d) / Σ chars over segments. 0.0 for
    ≤1 segment. Same normalization, same map-only contract — one
    O(distinct × n) pass via higher-order functions, nothing leaves the
    row."""
    return let_bound(
        _norm_segments(col, sep),
        lambda segs: let_bound(
            F.aggregate(segs, F.lit(0),
                        lambda a, s: a + F.length(s)).cast("double"),
            lambda tot: F.when(
                (F.size(segs) > 1) & (tot > 0),
                F.aggregate(
                    F.array_distinct(segs), F.lit(0),
                    lambda a, d: a + (F.size(F.filter(segs,
                                                      lambda x: x == d)) - 1)
                    * F.length(d)) / tot)
            .otherwise(F.lit(0.0))))


def corpus_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """One-row corpus health report — the numbers a pipeline owner checks
    before and after every filter stage: doc count, token totals/extremes,
    exact-duplicate text count, vocabulary size. All exact integers.

    Plan: the per-doc signals (token count, normalized fingerprint) are
    map-only expressions feeding ONE global aggregate (partial-agged, no
    groupBy key — Catalyst merges per-partition partials, no single-task
    funnel); the vocabulary size needs its own explode + count_distinct
    pass and rides in on a 1-row broadcast cross join. Two corpus scans
    total, both streaming, nothing corpus-sized ever shuffles (distinct
    fingerprints/tokens exchange hash-sized partials).
    """
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col),
                     F.size(toks).alias("__nt"),
                     fingerprint64(F.col(text_col)).alias("__fp"))
    main = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
        F.min("__nt").alias("min_doc_tokens"),
        F.max("__nt").alias("max_doc_tokens"),
        F.count_distinct(F.col("__fp")).alias("n_unique_texts"))
    vocab = (df.select(F.explode(toks).alias("tok"))
             .agg(F.count_distinct("tok").alias("vocab_size")))
    return main.join(F.broadcast(vocab))


def collocations(df, text_col: str = "text", min_count: int = 5):
    """Pointwise-mutual-information collocation mining: adjacent token
    pairs scored by PMI = ln(p(w1 w2) / (p(w1)·p(w2))) — the classic
    phrase/collocation detector over a corpus (Church & Hanks 1990).

    Scale: same shuffle discipline as the bigram LM — pair and unigram
    counts are map-side combined (one row per distinct pair/token per
    partition crosses each exchange, never per occurrence); corpus scalars
    ride a 1-row broadcast; the unigram joins key on the token (vocab-sized
    side, AQE splits the hot-token skew; the hot token's count row is ONE
    row, so replication is free).

    Floats: the probability ratio is computed in ONE double expression with
    a pinned operand order (casts first, left-associated divisions) so the
    value is bit-identical across engines; pair it with integer-first
    ordering downstream (see q_collocations) for stable cuts.

    Returns (w1, w2, pair_cnt, pmi) for pairs with pair_cnt >= min_count.
    """
    toks = tokenize(F.col(text_col))
    pairs = let_bound(toks, lambda t: F.transform(  # O(n), not O(n²)
        F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))),
        lambda i: F.struct(F.element_at(t, i).alias("w1"),
                           F.element_at(t, i + 1).alias("w2"))))
    ex = (df.where(F.size(toks) >= 2)
          .select(F.explode(pairs).alias("bg"))
          .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")))
    pair_cnt = ex.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    uni = (df.select(F.explode(tokenize(F.col(text_col))).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
    # pair_cnt feeds the result AND the N2 scalar; uni feeds cx, cy AND N1
    # — without materialization that is FIVE corpus scans (pyspark 4.1
    # plans no ReusedExchange across these subtrees, same empirical finding
    # as lm.py). Two lazy localCheckpoints cut it to the two inherent
    # explodes; stored rows are distinct-pair/vocab-sized count tables.
    pair_cnt = materialize(pair_cnt, eager=False)
    uni = materialize(uni, eager=False)
    scalars = (pair_cnt.agg(F.sum("pair_cnt").alias("N2"))
               .join(F.broadcast(uni.agg(F.sum("cnt").alias("N1")))))
    cx = uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("cx"))
    cy = uni.select(F.col("tok").alias("w2"), F.col("cnt").alias("cy"))
    # double from the FIRST operand (no bigint·bigint overflow, ANSI-safe),
    # divisions left-associated — mirrored verbatim in the SQL oracle
    ratio = (F.col("pair_cnt").cast("double") * F.col("N1") * F.col("N1")
             / F.col("N2") / F.col("cx") / F.col("cy"))
    return (pair_cnt.where(F.col("pair_cnt") >= min_count)
            .join(cx, "w1").join(cy, "w2")
            .join(F.broadcast(scalars))
            .select("w1", "w2", "pair_cnt", F.log(ratio).alias("pmi")))


def char_entropy(col: Column) -> Column:
    """Shannon entropy (bits) of the character distribution — the classic
    gibberish/boilerplate signal: natural language sits ~4-4.6 bits,
    single-char runs at 0, base64/random blobs push toward log2(alphabet).

    Map-only expression: distinct chars (≤ alphabet size, not text length)
    drive one O(distinct × len) counting pass via higher-order functions —
    no explode, no shuffle, nothing leaves the row. Empty/null-safe: 0.0.
    The trailing ``+ 0.0`` canonicalizes IEEE negative zero: a
    single-distinct-char text sums to -(1·log2(1)) = -0.0, which stringifies
    as '-0' and breaks cross-engine value comparison (fuzz-axis finding).
    """
    return let_bound(
        F.split(col, ""),
        lambda chars: let_bound(
            F.array_distinct(chars),
            lambda alphabet: F.coalesce(
                -F.aggregate(
                    alphabet,
                    F.lit(0.0),
                    lambda acc, c: acc + let_bound(
                        F.size(F.filter(chars, lambda x: x == c))
                        / F.size(chars).cast("double"),
                        lambda p: p * F.log2(p))),
                F.lit(0.0)) + F.lit(0.0)))
