"""Deterministic, reproducible sampling for training-data pipelines.

`df.sample(fraction)` draws a different sample every run (and every retry
of a failed task unless the seed plumbing is perfect) — unacceptable for a
pipeline whose outputs must be auditable and re-runnable byte-for-byte at
100 TB. These operators derive membership from a cryptographic hash of a
stable key column, so:

- the same row lands in the same split on every run, cluster size, and
  partition layout;
- samples compose (a 1% sample is a subset of the 10% sample);
- train/val/test are provably disjoint and cover the corpus;
- everything is a pure Column expression: whole-stage codegen, no RNG
  state, no UDFs, pushdown-friendly.

Salt hygiene: within-stage determinism is the feature, but ACROSS
pipeline stages it means two operators keyed on the same column with the
same salt share ONE hash and their memberships correlate perfectly — a
0.9 `deterministic_sample`/`stratified_sample` under the default salt
keeps exactly the range a later default-salt 90/5/5 `split_column`
labels 'train', leaving val/test empty. Give every sampling STAGE of a
pipeline its own ``salt=``; only reuse a salt when subset composition
between two fractions is exactly what you want.

The reference's seeded `sample(p, seed)` / `shard(n, seed)`
(RichPipe.scala:488-489,199-229) give per-run reproducibility only if the
input split layout is identical; hash-based sampling is the stronger
contract the same API is usually reaching for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scalding_spark.session import materialize

# 2^32 buckets from the first 8 hex chars of md5 — plenty of resolution for
# per-mille sampling, and cheap to mirror in any engine with md5().
_BUCKETS = 1 << 32


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, 2^32) from md5(salt || key).

    md5 (not xxhash64/crc32) so any SQL engine can reproduce the exact
    membership — the sample definition is part of the dataset contract,
    not an engine implementation detail."""
    key = F.col(key) if isinstance(key, str) else key
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return F.conv(hexpart, 16, 10).cast("bigint")


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket falls below fraction — a stable,
    composable Bernoulli sample keyed on `key_col`."""
    cutoff = int(round(fraction * _BUCKETS))
    return df.where(hash_bucket(key_col, salt) < F.lit(cutoff))


def split_column(key: Column | str, weights: dict[str, float],
                 salt: str = "") -> Column:
    """A label column assigning each row to one named split by cumulative
    hash-range partitioning: {'train': .9, 'val': .05, 'test': .05} →
    disjoint ranges covering [0, 2^32). Order of dict entries fixes the
    range layout, so adding a split later only moves rows at the tail."""
    bucket = hash_bucket(key, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cutoff = int(round(cum * _BUCKETS))
        clause = bucket < F.lit(cutoff)
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def train_val_test_split(df: DataFrame, key_col: str,
                         weights: dict[str, float] | None = None,
                         salt: str = "") -> DataFrame:
    """Add a 'split' column: deterministic, disjoint, covering."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    return df.withColumn("split", split_column(key_col, weights, salt))


def leakage_safe_split(df: DataFrame, key_col: str, labels: DataFrame,
                       cluster_col: str = "cluster_id",
                       weights: dict[str, float] | None = None,
                       salt: str = "",
                       broadcast_labels: bool = False) -> DataFrame:
    """Train/val/test split keyed on the DEDUP CLUSTER, not the document:
    every member of a near-dup cluster hashes the same key, so duplicates
    can never straddle train and test — the eval-leakage failure mode that
    per-document splitting guarantees whenever the corpus has near-dups
    (Lee et al. 2022 measure exactly this contamination channel).

    ``labels`` is a ``(key_col, cluster_col)`` frame with at most one row
    per key — e.g. ``dedup.dedup_clusters`` output, or a min-id-per-
    fingerprint window for exact duplicates. Keys absent from it are
    singletons and split by their own key, which coalesces to the same
    hash ``dedup_clusters``' own-id fallback convention would produce.

    100 TB shape: the split label itself stays a pure md5-range Column
    expression (same contract as :func:`split_column`); the only data
    movement is the left join against ``labels``. Restricted to multi-doc
    clusters the labels side is the corpus' duplicate fraction — pass
    ``broadcast_labels=True`` when that fits in memory, otherwise it is
    one hash join on ``key_col``.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # reserved internal alias: df may legitimately carry its own column
    # named cluster_col (e.g. dedup_clusters output fed straight in) —
    # joining unaliased would make the coalesce reference ambiguous
    lab = labels.select(F.col(key_col),
                        F.col(cluster_col).alias("__lss_cluster"))
    if broadcast_labels:
        lab = F.broadcast(lab)
    joined = df.join(lab, on=key_col, how="left")
    effective = F.coalesce(F.col("__lss_cluster").cast("string"),
                           F.col(key_col).cast("string"))
    return (joined.withColumn("split", split_column(effective, weights, salt))
            .drop("__lss_cluster"))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      fractions: dict[str, float], default: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (the `sampleBy` shape): each
    stratum gets its own hash-range cutoff — e.g. downsample a dominant
    crawl source to 10% while keeping books at 100%. Strata not listed get
    `default`. Same md5 contract as deterministic_sample: reproducible,
    composable across fractions, no RNG."""
    bucket = hash_bucket(key_col, salt)
    cutoff = None
    for name, frac in fractions.items():
        cutoff_v = F.lit(int(round(frac * _BUCKETS)))
        clause = F.col(strata_col) == name
        cutoff = (F.when(clause, cutoff_v) if cutoff is None
                  else cutoff.when(clause, cutoff_v))
    cutoff = (F.lit(int(round(default * _BUCKETS))) if cutoff is None
              else cutoff.otherwise(F.lit(int(round(default * _BUCKETS)))))
    return df.where(bucket < cutoff)


def weighted_sample(df: DataFrame, key_col: str, weight: Column,
                    salt: str = "") -> DataFrame:
    """Per-row Bernoulli keep with probability ``clamp(weight, 0, 1)`` —
    the quality-weighted corpus downsample ("keep documents proportionally
    to their quality score") of pretraining pipelines, on the same md5
    determinism contract as :func:`deterministic_sample`:

    - membership is ``hash_bucket(key) < floor(weight · 2^32)``: stable
      across reruns, retries, and partition layouts;
    - monotone-composable: raising a row's weight can only ADD it to the
      sample, lowering can only remove it — a re-weighted corpus diffs
      incrementally instead of resampling from scratch;
    - pure Column expressions (the weight itself may be any expression,
      e.g. a model score), so the filter fuses into the scan.

    ``floor`` (not a cast) fixes the cutoff: double→int casts round in
    some engines and truncate in others, which would flip boundary rows
    cross-engine."""
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    cutoff = F.floor(w * float(_BUCKETS)).cast("bigint")
    return df.where(hash_bucket(key_col, salt) < cutoff)


def pack_sequences(df: DataFrame, text_col: str, id_col: str,
                   seq_tokens: int, sep: str = "\n") -> DataFrame:
    """Cross-document sequence packing: greedy-fill fixed token budgets in
    deterministic ``id_col`` order, CONCATENATING whole documents (never
    splitting one) — the "pack short docs into 2048-token training
    sequences" prep step. The complement of
    :func:`scalding_spark.functions.text.chunk_documents`, which splits
    LONG docs; real pipelines chunk first, then pack.

    Plan: per-doc token counts (pure expressions) → the key-less parallel
    running sum of :func:`pack_into_shards` (range partitioning +
    broadcast prefix offsets — no single-task window) → one groupBy
    reassembling each sequence's text in id order. A sequence overruns by
    at most one document. Zero-token docs are weighted 1 so a run of them
    cannot pile into one unbounded sequence — the per-sequence collect is
    bounded by ``seq_tokens`` members.

    Returns (seq_id, text, n_docs, n_tokens).
    """
    from scalding_spark.functions.text import tokenize
    # null text packs as an EMPTY member (weight 1, an empty line in the
    # joined sequence) — coalescing up front keeps the reassembly exact:
    # array_join would silently SKIP a null element, so an all-null
    # sequence would render "" while SQL string_agg renders NULL, and a
    # mixed sequence would lose its separator slot.
    sized = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
        F.greatest(F.size(tokenize(F.col(text_col))), F.lit(1)).alias("__w"))
    packed = pack_into_shards(sized, "__w", seq_tokens, ["__id"],
                              out="seq_id")
    return (packed.groupBy("seq_id")
            .agg(F.array_join(
                     F.array_sort(F.collect_list(F.struct("__id", "__text")))
                     .getField("__text"), sep).alias(text_col),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__w").alias("n_tokens")))


def mix_to_proportions(df: DataFrame, key_col: str, domain_col: str,
                       size_col: str, proportions: dict[str, float],
                       total: int, salt: str = "",
                       stats: dict | None = None) -> DataFrame:
    """Downsample each domain so the kept corpus approaches a target token
    budget and mix — THE data-mixing primitive of pretraining pipelines
    ("30% web, 20% code, ... within a 1T-token budget").

    For each listed domain d: keep fraction
    ``min(1, proportions[d] · total / size_d)`` where ``size_d`` is the
    domain's total ``size_col`` (tokens/chars/bytes — an exact integer
    sum, so the fractions are engine-reproducible). Unlisted domains are
    dropped. Membership uses the same md5 contract as
    :func:`deterministic_sample` — reproducible, layout-independent, and
    composable: raising a domain's budget only adds rows.

    One tiny aggregation (#domains rows) feeds driver-computed cutoffs;
    the filter itself is a pure broadcast-free CASE expression fused into
    the scan. A domain whose corpus is smaller than its budget keeps
    everything (fraction clamps at 1) — the achieved mix then under-shoots
    that target, it never steals from other domains.

    ``stats`` gains ``fractions`` and ``domain_sizes``.
    """
    sizes = {r["d"]: r["s"] for r in
             df.groupBy(F.col(domain_col).alias("d"))
               .agg(F.sum(F.col(size_col)).alias("s")).collect()
             if r["d"] in proportions}
    fractions = {
        d: min(1.0, (proportions[d] * total) / sizes[d]) if sizes.get(d)
        else 0.0
        for d in proportions}
    if stats is not None:
        stats["fractions"] = fractions
        stats["domain_sizes"] = sizes
    bucket = hash_bucket(key_col, salt)
    cutoff = None
    for d in sorted(fractions):
        cut = F.lit(int(fractions[d] * _BUCKETS))  # floor, like weighted_sample
        clause = F.col(domain_col) == d
        cutoff = (F.when(clause, cut) if cutoff is None
                  else cutoff.when(clause, cut))
    cutoff = F.lit(0) if cutoff is None else cutoff.otherwise(F.lit(0))
    return df.where(bucket < cutoff)


def cap_per_key(df: DataFrame, key_col: str, n: int,
                order_cols: list) -> DataFrame:
    """Keep at most ``n`` rows per key — the domain-mixing cap ("no more
    than n docs per domain") of pretraining pipelines.

    ``order_cols`` must be a deterministic TOTAL order within each key
    (e.g. the doc id, or ``hash_bucket(id_col, salt)`` for selection
    uncorrelated with id assignment) — then reruns, retries, and different
    cluster layouts keep the same rows, the same auditability contract as
    deterministic_sample. A key-constant order (like hashing the key
    itself) would make the survivors arbitrary. Plan: per-key window
    row_number ≤ n — fine at any corpus size because domain cardinality
    scales with the corpus (millions of window partitions spread across
    executors); a SINGLE pathological key is bounded by the sort of its
    group, not a cross-partition funnel."""
    from pyspark.sql import Window
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def pack_into_shards(df: DataFrame, weight_col: str, shard_budget: int,
                     order_cols: list[str], out: str = "shard") -> DataFrame:
    """Assign rows to contiguous fixed-budget shards (training-shard
    packing: ~shard_budget tokens per output file) under a caller-supplied
    deterministic total order.

    shard = floor(start_offset / budget) where start_offset is the running
    weight sum EXCLUSIVE of the row — so a shard overruns by at most one
    document rather than splitting documents. Runs on the key-less parallel
    scan (range partitioning + broadcast prefix offsets), never a
    single-task window."""
    from scalding_spark.pipe import Pipe
    p = Pipe(df).group_all().sort_by(*order_cols).scan_left(weight_col, "__cum")
    return (p.df.withColumn(
        out, F.floor((F.col("__cum") - F.col(weight_col)) / F.lit(shard_budget))
        .cast("bigint"))
        .drop("__cum"))


def top_fraction(df: DataFrame, order_by: list, fraction: float,
                 tie_break: str) -> DataFrame:
    """Keep exactly ``ceil(n * fraction)`` rows — the globally best under
    ``order_by`` (list of Columns, best first) — the "train on the top X%
    by quality score" cut.

    Unlike ``df.orderBy(...).limit(k)`` the cut count is a FRACTION of a
    corpus whose size isn't known up front, and unlike per-partition
    sampling the cut is exact and deterministic: global rank via the
    parallel range-partition pattern (no single-task window, no driver
    count round-trip), ``tie_break`` (an id column) forces a total order,
    and membership is rank <= ceil(n·fraction) with both sides exact
    integers. Returns the kept rows of ``df`` unchanged (no rank column).
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from scalding_spark.pipe import Pipe
    ranked = (Pipe(df)
              .rank_by(*order_by, F.col(tie_break), rank_col="__rk")
              .to_df())
    # shared subtree: ranked feeds the count broadcast AND the filter join;
    # materialize once (same discipline as perplexity_buckets — the
    # broadcast build is a separate job, no ReusedExchange)
    ranked = materialize(ranked, eager=False)
    total = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("__n")))
    # EXACT integer cut: rk <= ceil(n·num/den)  ⟺  (rk-1)·den < n·num —
    # ceil(n * float(f)) is engine-dependent for non-dyadic f (see
    # lm.perplexity_buckets for the measured fuzz-axis case)
    from fractions import Fraction
    fr = Fraction(float(fraction)).limit_denominator(1_000_000)
    keep = ((F.col("__rk") - 1) * F.lit(fr.denominator)
            < F.col("__n") * F.lit(fr.numerator))
    return (ranked.join(total).where(keep)
            .drop("__rk", "__n"))


def temperature_mix(df: DataFrame, key_col: str, domain_col: str,
                    size_col: str, total: int, alpha: float = 0.3,
                    salt: str = "", stats: dict | None = None) -> DataFrame:
    """Temperature-based domain mixing (the mT5/XLM-R multilingual
    sampling rule): target proportion of domain d is
    ``size_d^alpha / Σ size^alpha`` — ``alpha=1`` keeps the natural
    distribution, ``alpha→0`` approaches uniform, and the usual
    ``alpha≈0.3`` boosts low-resource domains without drowning the head.

    A thin driver on :func:`mix_to_proportions`: one #domains-row
    aggregation computes the sizes, the exponentiated shares are derived
    driver-side (#domains floats), and the same md5-cutoff machinery
    applies them — reproducible, layout-independent, scan-fused.

    ``stats`` gains ``proportions`` (plus mix_to_proportions' own keys).
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    sizes = {r["d"]: r["s"] for r in
             df.groupBy(F.col(domain_col).alias("d"))
               .agg(F.sum(F.col(size_col)).alias("s")).collect()
             if r["d"] is not None and r["s"]}
    powed = {d: float(s) ** alpha for d, s in sizes.items()}
    # sum in sorted-domain order: collect() row order is layout-dependent,
    # and float addition isn't associative — a fixed order makes the
    # normalizer (hence every cutoff) bit-reproducible across runs/engines
    z = 0.0
    for d in sorted(powed):
        z += powed[d]
    props = {d: p / z for d, p in powed.items()} if z > 0 else {}
    if stats is not None:
        stats["proportions"] = props
    return mix_to_proportions(df, key_col, domain_col, size_col, props,
                              total, salt, stats)
