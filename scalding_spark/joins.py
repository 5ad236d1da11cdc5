"""Join algorithms — parity with the reference's ``JoinAlgorithms``
(scalding-core/src/main/scala/com/twitter/scalding/JoinAlgorithms.scala) and
the typed joins (typed/CoGrouped2.scala, typed/HashCoGrouped2.scala).

Strategy mapping (SURVEY.md §2.5):

- ``joinWithSmaller/Larger``  → sort-merge/shuffle-hash equi-join; Catalyst +
  AQE pick the physical algorithm and handle skew splitting.
- ``joinWithTiny``            → ``F.broadcast`` replicated hash join (no shuffle
  of the big side — the critical 100 TB pattern for dimension tables).
- ``blockJoin/skewJoin``      → AQE skew-join covers the common case; an
  explicit salted join is provided for extreme single-key skew where even one
  AQE-split partition is too large.
- semi/anti                   → native left_semi/left_anti (the reference
  emulates with join+null-filter, Matrix.scala:632-693).
- ``coGroupBy`` n-way         → chained joins, or true cogroup via
  ``applyInPandas`` over ``df.groupBy(k).cogroup(...)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe


def _df(p) -> DataFrame:
    return p.df if isinstance(p, Pipe) else p


def join_with_smaller(left, right, on, how: str = "inner") -> Pipe:
    """Reduce-side equi-join (JoinAlgorithms.scala:155-182). Both sides
    shuffle on the key; Spark's sort-merge join streams both sides instead of
    buffering the right per key, so "call on the larger pipe" no longer
    matters for memory — kept for API parity."""
    return Pipe(_df(left).join(_df(right), on=on, how=how))


def join_with_larger(left, right, on, how: str = "inner") -> Pipe:
    """(JoinAlgorithms.scala:187-189) — same physical plan under Catalyst."""
    return join_with_smaller(left, right, on, how)


def join_with_tiny(left, right, on, how: str = "inner") -> Pipe:
    """Map-side replicated hash join (JoinAlgorithms.scala:221-236): the tiny
    side is broadcast to every task; the big side never shuffles. The
    reference forbids outer/right here (the replicated side can't observe
    global misses) — broadcast right-outer is likewise refused."""
    if how in ("right", "rightouter", "right_outer", "outer", "full", "fullouter", "full_outer"):
        raise ValueError(f"joinWithTiny does not support how={how!r} (JoinAlgorithms.scala:233)")
    return Pipe(_df(left).join(F.broadcast(_df(right)), on=on, how=how))


def cross_with_tiny(left, right) -> Pipe:
    """Cartesian with a replicated tiny side (JoinAlgorithms.scala:70-75)."""
    return Pipe(_df(left).crossJoin(F.broadcast(_df(right))))


def cross_with_smaller(left, right) -> Pipe:
    """Cartesian with a non-tiny right side (JoinAlgorithms.scala:81-86):
    plain crossJoin — AQE balances the replication that the reference's
    blockJoin replication factor hand-tuned."""
    return Pipe(_df(left).crossJoin(_df(right)))


def semi_join(left, right, on) -> Pipe:
    """keepRowsBy / keepElementsBy (Matrix.scala:632-667) → native left_semi."""
    return Pipe(_df(left).join(_df(right), on=on, how="left_semi"))


def anti_join(left, right, on) -> Pipe:
    """removeRowsBy / removeElementsBy (Matrix.scala:669-693) → left_anti."""
    return Pipe(_df(left).join(_df(right), on=on, how="left_anti"))


def salted_skew_join(left, right, on: list[str], salt: int = 16,
                     how: str = "inner", seed: int = 42) -> Pipe:
    """Explicit replicate-fragment join for extreme key skew — the
    blockJoin/skewJoin family (JoinAlgorithms.scala:265-458,
    SkewReplication.scala:21-66), as a static-salting recipe:

    - left rows get a random fragment id in [0, salt);
    - right rows are replicated once per fragment (explode over sequence);
    - the join key becomes (key..., fragment), spreading each hot key over
      ``salt`` reducers.

    Prefer AQE's sampled skew handling (on by default in session.py); use
    this when a single key exceeds what one AQE-split partition can hold or
    for non-AQE deployments. Inner/left only, like the reference's block join
    validity matrix (JoinAlgorithms.scala:286-293)."""
    if how not in ("inner", "left"):
        raise ValueError("salted skew join supports inner/left only (JoinAlgorithms.scala:286)")
    # exactly block_join's (left_repl=1, right_repl=salt) corner — one
    # implementation, one place to fix fragment/seed plumbing
    return block_join(left, right, on, left_repl=1, right_repl=salt,
                      how=how, seed=seed)


def block_join(left, right, on: list[str], left_repl: int = 1,
               right_repl: int = 1, how: str = "inner", seed: int = 42) -> Pipe:
    """Replicate-fragment ("block") join (JoinAlgorithms.scala:265-341):
    handles skew on BOTH sides by spreading each key over a
    ``left_repl × right_repl`` grid —

    - each left row gets a random fragment j ∈ [0, right_repl) and is
      replicated for every i ∈ [0, left_repl);
    - each right row gets a random fragment i ∈ [0, left_repl) and is
      replicated for every j ∈ [0, right_repl);
    - joining on (key, i, j) meets every (left row, right row) pair exactly
      once.

    Validity matrix as in the reference (JoinAlgorithms.scala:286-293):
    inner allows both factors; left requires left_repl == 1; right requires
    right_repl == 1 (a replicated outer side would duplicate misses)."""
    if how == "left" and left_repl != 1:
        raise ValueError("left block join requires left_repl == 1 (JoinAlgorithms.scala:288)")
    if how == "right" and right_repl != 1:
        raise ValueError("right block join requires right_repl == 1 (JoinAlgorithms.scala:289)")
    if how not in ("inner", "left", "right"):
        raise ValueError(f"block join does not support how={how!r} (JoinAlgorithms.scala:286)")
    ldf = (_df(left)
           .withColumn("__j", (F.rand(seed=seed) * right_repl).cast("int"))
           .withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(left_repl - 1)))))
    rdf = (_df(right)
           .withColumn("__i", (F.rand(seed=seed + 1) * left_repl).cast("int"))
           .withColumn("__j", F.explode(F.sequence(F.lit(0), F.lit(right_repl - 1)))))
    joined = ldf.join(rdf, on=on + ["__i", "__j"], how=how).drop("__i", "__j")
    return Pipe(joined)


class SkewReplication:
    """Replication policy for ``skew_join`` (SkewReplication.scala:21-33).

    Given a key's SAMPLED per-side counts, yields the (left, right)
    replication grid for that key as Column expressions — evaluated inside
    the tiny hot-key aggregate, so the policy adds zero per-row cost at any
    scale. ``reducers <= 0`` falls back to the reference's
    ``DEFAULT_NUM_REDUCERS = 100``.
    """

    DEFAULT_NUM_REDUCERS = 100

    def _reducers(self, reducers: int) -> int:
        return reducers if reducers > 0 else self.DEFAULT_NUM_REDUCERS

    def replications(self, l_cnt: Column, r_cnt: Column,
                     reducers: int) -> tuple[Column, Column]:
        raise NotImplementedError


class SkewReplicationA(SkewReplication):
    """Strategy A (SkewReplication.scala:38-50): replicate each side by the
    OTHER side's sampled count times ``replication_factor``, capped at the
    reducer count; unsampled keys keep replication 1."""

    def __init__(self, replication_factor: int = 1):
        self.replication_factor = replication_factor

    def replications(self, l_cnt, r_cnt, reducers):
        n = F.lit(self._reducers(reducers))
        left = F.least(r_cnt * self.replication_factor, n)
        right = F.least(l_cnt * self.replication_factor, n)
        return (F.when(left == 0, 1).otherwise(left).cast("int"),
                F.when(right == 0, 1).otherwise(right).cast("int"))


class SkewReplicationB(SkewReplication):
    """Strategy B (SkewReplication.scala:55-66): memory/output-capped —
    left replication keeps ≤ ``max_keys_in_memory`` right rows per fragment,
    right replication keeps ≤ ``max_reducer_output`` joined rows per reducer
    (integer arithmetic, like the reference's Int division)."""

    def __init__(self, max_keys_in_memory: int = 10**6,
                 max_reducer_output: int = 10**7):
        self.max_keys_in_memory = max_keys_in_memory
        self.max_reducer_output = max_reducer_output

    def replications(self, l_cnt, r_cnt, reducers):
        n = F.lit(self._reducers(reducers))
        left = F.greatest(F.lit(1),
                          F.floor(r_cnt / self.max_keys_in_memory))
        right = F.least(n, F.floor((l_cnt * r_cnt)
                                   / (self.max_reducer_output * left)))
        return (left.cast("int"),
                F.when(right == 0, 1).otherwise(right).cast("int"))


def skew_join(left, right, on: list[str], sample_rate: float = 0.001,
              rows_per_fragment: int = 100_000, max_repl: int = 32,
              seed: int = 42,
              replication: SkewReplication | None = None,
              reducers: int = 0) -> Pipe:
    """Sampled skew join (JoinAlgorithms.scala:365-458): sample both sides →
    per-key counts → per-key replication factors → replicate-fragment join,
    the reference's SkewReplication strategy expressed as one broadcast of
    the hot-key table:

    1. each side is sampled at ``sample_rate`` and counted per key (two tiny
       aggregations);
    2. a key's fragment grid is (L_k, R_k) with
       L_k = clamp(est_right_rows / rows_per_fragment), R_k symmetric —
       mirroring SkewReplication's "replicate each side by the other side's
       volume" rule (SkewReplication.scala:38-66) with the strategy-B caps;
    3. only keys with a factor > 1 enter the broadcast hot-key map; cold keys
       join on the plain key with zero overhead.

    Equivalent results to a plain inner join (the reference's own test
    criterion, SkewJoinTest.scala:100-140). Under AQE this is usually
    unnecessary — keep for single-hot-key extremes and non-AQE deployments.

    ``replication``: an explicit :class:`SkewReplication` policy
    (:class:`SkewReplicationA` / :class:`SkewReplicationB`, the reference's
    A/B pair) computed over the raw sampled counts, replacing the default
    estimated-volume heuristic; ``reducers`` feeds the policy's cap."""
    ldf, rdf = _df(left), _df(right)
    est = 1.0 / sample_rate

    def hot_counts(df, out):
        return (df.sample(sample_rate, seed=seed).groupBy(*on)
                .agg(F.count(F.lit(1)).alias(out)))

    lc = hot_counts(ldf, "l_cnt")
    rc = hot_counts(rdf, "r_cnt")
    l_cnt = F.coalesce(F.col("l_cnt"), F.lit(0))
    r_cnt = F.coalesce(F.col("r_cnt"), F.lit(0))
    if replication is not None:
        lr, rr = replication.replications(l_cnt, r_cnt, reducers)
    else:
        # default heuristic: fragment by the other side's ESTIMATED volume
        # (strategy-B-flavored, with an explicit max_repl ceiling)
        lr = F.least(F.greatest(F.ceil(r_cnt * est / rows_per_fragment),
                                F.lit(1)), F.lit(max_repl)).cast("int")
        rr = F.least(F.greatest(F.ceil(l_cnt * est / rows_per_fragment),
                                F.lit(1)), F.lit(max_repl)).cast("int")
    hot = (lc.join(rc, on=on, how="full_outer")
           .select(*on, lr.alias("__lr"), rr.alias("__rr"))
           .where((F.col("__lr") > 1) | (F.col("__rr") > 1)))
    hot = F.broadcast(hot)

    lx = (ldf.join(hot, on=on, how="left")
          .withColumn("__lr", F.coalesce("__lr", F.lit(1)))
          .withColumn("__rr", F.coalesce("__rr", F.lit(1)))
          .withColumn("__j", (F.rand(seed=seed) * F.col("__rr")).cast("int"))
          .withColumn("__i", F.explode(F.sequence(F.lit(0), F.col("__lr") - 1)))
          .drop("__lr", "__rr"))
    rx = (rdf.join(hot, on=on, how="left")
          .withColumn("__lr", F.coalesce("__lr", F.lit(1)))
          .withColumn("__rr", F.coalesce("__rr", F.lit(1)))
          .withColumn("__i", (F.rand(seed=seed + 1) * F.col("__lr")).cast("int"))
          .withColumn("__j", F.explode(F.sequence(F.lit(0), F.col("__rr") - 1)))
          .drop("__lr", "__rr"))
    return Pipe(lx.join(rx, on=on + ["__i", "__j"], how="inner").drop("__i", "__j"))


def cogroup(left, right, keys: list[str], fn: Callable, schema: str) -> Pipe:
    """True n=2 cogroup (typed cogroup, TypedPipe.scala:476-482,
    CoGroupBuilder.scala:27-50): ``fn(key_tuple, left_pdf, right_pdf) -> pdf``
    runs once per key with both sides' rows — Arrow-batched, both sides
    shuffled on the key (one co-partitioned exchange each)."""
    g = _df(left).groupBy(*keys).cogroup(_df(right).groupBy(*keys))
    return Pipe(g.applyInPandas(fn, schema=schema))


def as_of_join(left, right, on: list[str], left_ts: str, right_ts: str,
               tolerance_seconds: float | None = None,
               direction: str = "backward") -> Pipe:
    """As-of join (absent in the reference — SURVEY §2.5 extension): for each
    left row, attach the matching right row per key — the LATEST with
    right_ts ≤ left_ts (``direction='backward'``, default), the EARLIEST
    with right_ts ≥ left_ts (``'forward'``), or whichever is closest in
    absolute gap (``'nearest'``, backward winning exact ties) — the full
    pandas ``merge_asof`` direction surface.

    Plan — the scalable union+window formulation, NOT a non-equi range join
    (which Spark can only plan as a broadcast-nested-loop):

      union both sides tagged → one window per key ordered by (ts, side) →
      last non-null right payload carried forward → keep left rows.

    Forward runs the same window descending; nearest evaluates both
    directions over the SAME key partitioning (two in-partition sorts, still
    ONE exchange). ``tolerance`` nulls out matches whose |gap| exceeds the
    budget (pandas merge_asof semantics).

    Right-side payload columns whose names collide with a left output column
    (including one named like ``left_ts``) are auto-suffixed ``_right`` —
    otherwise the final projection would emit duplicate names and the result
    would be unselectable downstream.
    """
    ldf, rdf = _df(left), _df(right)
    # SQL join semantics for NULL keys: NULL never equals NULL, so a
    # null-keyed right row can match nothing — drop it BEFORE the union
    # (the window's partitionBy would otherwise group null keys together
    # and fabricate matches between unknown-key rows; fuzz-axis finding
    # vs DuckDB's native ASOF JOIN). Null-keyed LEFT rows still come back
    # (left-join contract) — their partition simply holds no right rows.
    for k in on:
        rdf = rdf.where(F.col(k).isNotNull())
    l_payload = [c for c in ldf.columns if c not in on + [left_ts]]
    r_payload = [c for c in rdf.columns if c not in on + [right_ts]]
    taken = set(on) | {left_ts} | set(l_payload)
    r_out = {c: (c + "_right" if c in taken else c) for c in r_payload}

    lu = ldf.select(
        *on, F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        F.struct(*l_payload).alias("__l"), F.lit(None).cast("double").alias("__rts"),
        F.lit(None).cast(
            rdf.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("__r"))
    ru = rdf.select(
        *on, F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        F.lit(None).cast(
            ldf.select(F.struct(*l_payload).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.col(right_ts).cast("double").alias("__rts"),
        F.struct(*r_payload).alias("__r"))

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}")
    u = lu.unionByName(ru)
    # at equal ts the right row (side 0) sorts first in BOTH orderings, so
    # equality is an inclusive match in every direction
    wb = (Window.partitionBy(*on).orderBy("__ts", "__side")
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*on).orderBy(F.col("__ts").desc(), "__side")
          .rowsBetween(Window.unboundedPreceding, 0))
    lts = F.col("__ts").cast("double")

    def carry(w):
        return (F.last("__r", ignorenulls=True).over(w),
                F.last("__rts", ignorenulls=True).over(w))

    if direction == "backward":
        match, mts = carry(wb)
        gap = lts - mts
    elif direction == "forward":
        match, mts = carry(wf)
        gap = mts - lts
    else:
        mb, bts = carry(wb)
        mf, fts = carry(wf)
        gb, gf = lts - bts, fts - lts
        use_f = bts.isNull() | (fts.isNotNull() & (gf < gb))  # tie → backward
        match = F.when(use_f, mf).otherwise(mb)
        gap = F.when(use_f, gf).otherwise(gb)
    carried = (u.withColumn("__match", match)
               .withColumn("__gap", gap)
               .where(F.col("__side") == 1))
    if tolerance_seconds is not None:
        carried = carried.withColumn(
            "__match", F.when(F.col("__gap") <= tolerance_seconds,
                              F.col("__match")))
    out = carried.select(
        *on, F.col("__ts").alias(left_ts),
        *[F.col("__l")[c].alias(c) for c in l_payload],
        *[F.col("__match")[c].alias(r_out[c]) for c in r_payload])
    return Pipe(out)


def range_join(points, intervals, point_ts: str, start_ts: str, end_ts: str,
               on: list[str] | None = None, bucket_seconds: int = 600) -> Pipe:
    """Point-in-interval join (SURVEY §2.5 extension): each ``points`` row
    matched to every ``intervals`` row with start ≤ point ≤ end (inclusive),
    optionally under equality keys ``on``.

    Plan — bucketed equi-join, NOT the naive non-equi join (which Spark can
    only plan as a broadcast-nested-loop, quadratic at scale): both sides are
    binned to fixed-width time buckets, intervals replicated to every bucket
    they overlap, then a plain shuffled equi-join on (keys, bucket) + exact
    range filter. A point's bucket is unique, so each match appears exactly
    once — no dedup pass. Pick ``bucket_seconds`` near the typical interval
    length: replication factor is len/width + 1.

    Caller renames clashing payload columns (standard join contract).
    """
    on = on or []
    us = int(bucket_seconds) * 1_000_000
    p = _df(points).withColumn(
        "__bin", F.floor(F.unix_micros(F.col(point_ts)) / F.lit(us)))
    i = _df(intervals).withColumn(
        "__bin",
        F.explode(F.sequence(
            F.floor(F.unix_micros(F.col(start_ts)) / F.lit(us)),
            F.floor(F.unix_micros(F.col(end_ts)) / F.lit(us)))))
    j = (p.join(i, on=on + ["__bin"])
         .where((F.col(point_ts) >= F.col(start_ts))
                & (F.col(point_ts) <= F.col(end_ts)))
         .drop("__bin"))
    return Pipe(j)


def multi_join(pipes: list, on: list[str], hows: list[str] | None = None) -> Pipe:
    """coGroupBy star join (JoinAlgorithms.scala:53-55): n-way equi-join on a
    shared key. Catalyst reuses the key's hash partitioning across the chained
    joins, so the fact table shuffles once, not n times."""
    hows = hows or ["inner"] * (len(pipes) - 1)
    if len(hows) != len(pipes) - 1:
        # zip would silently TRUNCATE to the shorter list, dropping whole
        # tables from the join with no diagnostic
        raise ValueError(
            f"hows has {len(hows)} entries for {len(pipes)} pipes "
            f"(need {len(pipes) - 1})")
    out = _df(pipes[0])
    for p, how in zip(pipes[1:], hows):
        out = out.join(_df(p), on=on, how=how)
    return Pipe(out)


def fuzzy_join(left, right, left_col: str, right_col: str,
               left_id: str, right_id: str, max_distance: int = 1,
               out_distance: str = "distance",
               max_candidates: int | None = None,
               counter: str | None = None) -> Pipe:
    """EXACT edit-distance join: all (left, right) row pairs with
    levenshtein(left_col, right_col) <= ``max_distance`` — the entity-
    resolution / near-key join, without the crossJoin.

    Plan (PassJoin-family segment filter, Li et al. EDBT 2011 "PassJoin",
    with the multi-match-aware substring-selection window):

    - RIGHT side splits each string into k+1 contiguous segments:
      key = (len, segment_idx, segment_text). If ed(s, r) <= k, at most k
      segments of r are touched by edits, so (pigeonhole) at least one
      segment survives verbatim inside s, its start shifted by at most k.
    - LEFT side emits, for each plausible right length l in
      [len(s)-k, len(s)+k] and each segment slot, every substring of s
      that could be that surviving segment. The start-shift window per
      (length-difference Δ = len(s) - l, slot i) is the PROVABLE
      first-untouched-segment bound rather than a blanket ±k: pick the
      first edit-free segment i in an optimal alignment — every segment
      before it absorbs >= 1 of the <= k edits (a >= i ops before, so
      <= k - a after), the match shift δ is net insertions before
      (|δ| <= a) and Δ - δ is net insertions after (|Δ-δ| <= k - a) —
      giving max(i, |δ|) + |Δ - δ| <= k, and δ = 0 exactly for i = 0
      (nothing precedes segment 0; an insertion on its left boundary
      touches it). 6 keys/row for k=1 and 21 for k=2 where the naive
      ±k window emits 18 and 75 — a ~3.5x cut in candidate-exchange
      volume (validated exhaustively against brute-force edit distance
      over all 2-letter strings to length 7, plus randomized longer
      pairs; the suite's differential tests pin it end-to-end).
    - The whole candidate pipeline runs in DISTINCT-STRING space (r09,
      VERDICT r08 #2): each side first aggregates to (string, row
      multiplicity) — distinct and counts in ONE pass — so the key
      tables, the candidate equi-join, the distinct, and the exact
      ``levenshtein`` verify all cost |distinct strings|, not |rows|.
      Ids re-attach at the end by two string equi-joins over the
      verified pairs. With key multiplicity m the old id-space plan paid
      m² in candidate exchange + verify (the sf1 gate corpus: 300
      distinct strings × 150k rows → 37.4M id-pair verifies where ≤90k
      string-pair verifies suffice); the output id-pair materialization
      floor is unchanged — it IS the answer.
    - equi-join on the key → distinct candidate STRING pairs → exact
      ``levenshtein`` verification once per string pair → id expansion.

    Strings shorter than k+1 chars have no k+1-segment split; those RIGHT
    rows take a dedicated broadcast nested-loop path against the (also
    short, len <= 2k) left rows — correct, and cheap when short keys are
    rare (if most keys are <= k chars, an edit-distance-k join is the
    wrong tool).

    Exactness: the filter window is a superset of the tight PassJoin
    bound (recall-complete) and verification is exact — output equals the
    brute-force inequality join (each side's duplicate (id, string) rows
    collapse to one output pair on the main path, the historical distinct
    contract). Self-join dedup/ordering is the caller's concern (filter
    ``id_a < id_b`` downstream). Hot shared substrings (constant
    prefixes) inflate candidates; AQE skew-join splits the bucket — or
    strip known-constant prefixes before joining. The id-expansion joins
    hash on the STRING, so a very hot key concentrates its expansion in
    one task — AQE skew-join splits that too (the output multiplicity
    itself is irreducible).

    Returns (left_id, left_col, right_id, right_col, ``out_distance``);
    join payloads back by id.

    Guardrails (a hot shared substring — constant prefixes, empty-ish
    keys — can make the candidate join quadratic):

    - ``max_candidates``: CIRCUIT BREAKER. Before running the candidate
      join, the exact ID-LEVEL candidate volume Σ_key |L_key|·|R_key|
      (|·| counts ROWS, via the multiplicities the distinct-string
      tables carry — the same number the id-space plan measured) is
      computed from the two tiny per-key count tables; if it exceeds the
      cap the join raises ``ValueError`` LOUDLY instead of launching a
      runaway expansion. Costs one extra pass over the key tables
      (counts only — the strings never re-shuffle), so leave it None
      unless key hygiene is unknown.
    - ``counter``: registers an Observation of that name on the candidate
      stage (read with ``counters(name)`` after the action: metric
      ``n_candidates`` = id-level pre-distinct candidate pairs,
      Σ lm·rm over joined key rows — free, no extra pass) for monitoring
      candidate blowup in production runs.
    """
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    k = int(max_distance)
    ldf = _df(left).select(left_id, left_col)
    rdf = _df(right).select(right_id, right_col)
    if {left_id, left_col} & {right_id, right_col}:
        raise ValueError("left and right id/string column names must differ")

    def seg_bounds(n, i: int):
        """Segment i (0-based) of k+1 near-even segments of a length-n
        string: 1-based start and length (first n%(k+1) segments get the
        extra char — any deterministic split works, both sides use this)."""
        base = F.floor(n / (k + 1)).cast("int")
        extra = (n % (k + 1)).cast("int")
        li = base + F.when(F.lit(i) < extra, 1).otherwise(0)
        start = (F.lit(i) * base + F.least(F.lit(i), extra) + 1).cast("int")
        return start, li

    rn = F.length(F.col(right_col))
    ln = F.length(F.col(left_col))

    # distinct strings + row multiplicity per side, in ONE aggregation
    # (a groupBy-count IS a distinct, with the counts free): everything
    # until the final id expansion runs per distinct string
    lm, rm = "__fz_lm", "__fz_rm"
    l_sd = ldf.groupBy(left_col).agg(F.count(F.lit(1)).alias(lm))
    r_sd = rdf.groupBy(right_col).agg(F.count(F.lit(1)).alias(rm))

    # main path: rights long enough to have k+1 nonempty segments
    r_long = r_sd.where(rn > k)
    r_keys = F.array(*[
        F.struct(rn.cast("int").alias("l"), F.lit(i).alias("i"),
                 F.substring(F.col(right_col), *seg_bounds(rn, i)).alias("s"))
        for i in range(k + 1)])
    r_ex = r_long.select(right_col, rm, F.explode(r_keys).alias("__k")) \
                 .select(right_col, rm, "__k.*")

    def allowed_shifts(i: int, delta: int) -> list[int]:
        """Sound start-shift window for segment slot ``i`` at length
        difference ``delta`` = len(s) - l (see docstring derivation).
        Recall-complete: if ed(s, r) <= k, the first edit-free segment's
        verbatim match lands at shift δ with max(i,|δ|) + |Δ-δ| <= k
        (δ = 0 when i = 0)."""
        if i == 0:
            return [0]
        return [s_ for s_ in range(-k, k + 1)
                if max(i, abs(s_)) + abs(delta - s_) <= k]

    cands = []
    for d in range(-k, k + 1):
        l = ln + d          # candidate right-side length (n - l = -d)
        for i in range(k + 1):
            start, li = seg_bounds(l, i)
            for shift in allowed_shifts(i, -d):
                p = start + shift
                cands.append(F.when(
                    (l > k) & (p >= 1) & (p + li - 1 <= ln),
                    F.struct(l.cast("int").alias("l"), F.lit(i).alias("i"),
                             F.substring(F.col(left_col), p, li).alias("s"))))
    l_keys = F.array_distinct(
        F.filter(F.array(*cands), lambda x: x.isNotNull()))
    l_ex = l_sd.select(left_col, lm, F.explode(l_keys).alias("__k")) \
               .select(left_col, lm, "__k.*")

    if max_candidates is not None:
        # exact ID-LEVEL candidate volume from per-key multiplicity sums
        # (map-side combined; the join of two ≤#distinct-key tables is
        # tiny next to the expansion it guards) — same number the
        # id-space plan measured, so caps tuned against it carry over
        lc = l_ex.groupBy("l", "i", "s").agg(F.sum(lm).alias("ln_"))
        rc = r_ex.groupBy("l", "i", "s").agg(F.sum(rm).alias("rn_"))
        vol = (lc.join(rc, ["l", "i", "s"])
               .agg(F.coalesce(F.sum(F.col("ln_") * F.col("rn_")),
                               F.lit(0))).collect()[0][0])
        if vol > max_candidates:
            raise ValueError(
                f"fuzzy_join candidate volume {vol} exceeds max_candidates="
                f"{max_candidates} — a hot shared substring (constant "
                f"prefix?) is blowing up the segment join; strip constant "
                f"affixes or raise the cap")

    joined = l_ex.join(r_ex, ["l", "i", "s"])
    if counter is not None:
        # id-level candidates = Σ lm·rm over joined key rows (bit-same
        # number as the id-space plan's pre-distinct row count)
        joined = Pipe(joined).observe(
            counter, n_candidates=F.coalesce(
                F.sum(F.col(lm) * F.col(rm)), F.lit(0).cast("bigint"))).df

    # banded verify ONCE PER DISTINCT STRING PAIR (r09): the 3-arg
    # levenshtein computes only the ±k diagonal band, O((k+1)·n) instead
    # of O(n²) per pair, early-exiting to -1 above the threshold — same
    # kept rows and distances as the unbounded form filtered by <= k
    # (for kept pairs the band contains the true distance).
    ver_str = (joined
               .select(left_col, right_col).distinct()
               .withColumn(out_distance,
                           F.levenshtein(F.col(left_col), F.col(right_col),
                                         k))
               .where(F.col(out_distance) >= 0))
    # id expansion: re-attach each side's distinct (id, string) rows by
    # string equality — the only stage that touches id-level multiplicity,
    # and it only materializes TRUE pairs (the output floor)
    main = (ver_str
            .join(ldf.distinct(), left_col)
            .join(rdf.distinct(), right_col)
            .select(left_id, left_col, right_id, right_col, out_distance))

    # short-right path: no segment split exists; ed <= k forces the left
    # side short too (len(s) <= len(r) + k <= 2k) — tiny × tiny, broadcast
    short = (ldf.where(ln <= 2 * k)
             .join(F.broadcast(rdf.where(rn <= k)))
             .withColumn(out_distance,
                         F.levenshtein(F.col(left_col), F.col(right_col),
                                       k))
             .where(F.col(out_distance) >= 0))
    return Pipe(main.unionByName(short))
