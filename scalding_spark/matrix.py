"""Sparse COO linear algebra — parity with the reference's Matrix library
(scalding-core/src/main/scala/com/twitter/scalding/mathematics/Matrix.scala,
MatrixProduct.scala, SizeHint.scala).

A matrix is an *infinite, sparse* map (row, col) → val represented as a
DataFrame with columns ``row, col, val`` (Matrix.scala:34-50); absent entries
are zero and operations that produce zeros prune them (Matrix.scala:150-152).

Scale design:
- matmul = join on the inner dimension + groupBy(row,col) sum
  (MatrixProduct.scala:340-377). The SizeHint cost model
  (SizeHint.scala:37-132) decides whether the smaller operand is broadcast
  (the reference's maxTinyJoin=100k elements, MatrixProduct.scala:88) —
  otherwise it's a shuffled join that AQE can re-plan.
- elementwise ops = full outer join with monoid-zero fill
  (Matrix.scala:449-480, zip semantics Matrix.scala:580-627).
- per-row/col reductions = one hash aggregation; normalizations re-join the
  row norms back via a broadcast when the row count is small, else a window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scalding_spark.session import materialize

# The reference's broadcast cutoff: MatrixProduct.maxTinyJoin = 100000 elements
# (MatrixProduct.scala:88).
MAX_TINY_JOIN = 100_000


class SizeHintBase:
    """Micro cost model over matrix shapes (SizeHint.scala:37-46): an
    algebra of ``NoClue`` / ``FiniteHint`` / ``SparseHint`` whose ``*`` and
    ``+`` mirror product/sum shape propagation, used to pick broadcast vs
    shuffle for products (MatrixProduct.scala:86-108).

    Unknown dimensions are ``-1`` (the reference's convention); ``total``
    is ``None`` whenever either dimension is unknown — total ordering
    treats unknown as smaller than any known size (SizeHintOrdering,
    SizeHint.scala:136-141)."""

    rows: int = -1
    cols: int = -1
    sparsity: float = 1.0

    def __mul__(self, other: "SizeHintBase") -> "SizeHintBase":
        raise NotImplementedError

    def __add__(self, other: "SizeHintBase") -> "SizeHintBase":
        raise NotImplementedError

    @property
    def total(self) -> int | None:
        return None

    def set_cols(self, cols: int) -> "SizeHintBase":
        raise NotImplementedError

    def set_rows(self, rows: int) -> "SizeHintBase":
        raise NotImplementedError

    def set_cols_to_rows(self) -> "SizeHintBase":
        raise NotImplementedError

    def set_rows_to_cols(self) -> "SizeHintBase":
        raise NotImplementedError

    def transpose(self) -> "SizeHintBase":
        raise NotImplementedError

    # keep the round-1 method-call spelling working
    def times(self, other: "SizeHintBase") -> "SizeHintBase":
        return self * other

    def _ord(self) -> int:
        """SizeHintOrdering (SizeHint.scala:136-141): unknown totals sort
        below every known total."""
        t = self.total
        return -1 if t is None else t

    def __le__(self, other: "SizeHintBase") -> bool:
        return self._ord() <= other._ord()

    def __repr__(self) -> str:
        return (f"{type(self).__name__}(rows={self.rows}, cols={self.cols}, "
                f"sparsity={self.sparsity})")

    def __eq__(self, other) -> bool:
        return (type(self) is type(other) and self.rows == other.rows
                and self.cols == other.cols and self.sparsity == other.sparsity)

    def __hash__(self) -> int:
        return hash((type(self).__name__, self.rows, self.cols, self.sparsity))


class NoClue(SizeHintBase):
    """Absorbing unknown — "like NaN" (SizeHint.scala:49-58)."""

    def __mul__(self, other):
        return NO_CLUE

    def __add__(self, other):
        return NO_CLUE

    def set_cols(self, cols):
        return FiniteHint(-1, cols)

    def set_rows(self, rows):
        return FiniteHint(rows, -1)

    def set_cols_to_rows(self):
        return NO_CLUE

    def set_rows_to_cols(self):
        return NO_CLUE

    def transpose(self):
        return NO_CLUE


NO_CLUE = NoClue()


class FiniteHint(SizeHintBase):
    """Dense bound: every cell may be present (SizeHint.scala:60-82)."""

    def __init__(self, rows: int = -1, cols: int = -1):
        self.rows = int(rows)
        self.cols = int(cols)
        self.sparsity = 1.0

    def __mul__(self, other):
        if isinstance(other, NoClue):
            return NO_CLUE
        if isinstance(other, FiniteHint):
            return FiniteHint(self.rows, other.cols)
        return SparseHint(1.0, self.rows, self.cols) * other

    def __add__(self, other):
        if isinstance(other, NoClue):
            return NO_CLUE
        if isinstance(other, FiniteHint):
            # a hint on one side overwrites lack of knowledge (-1)
            return FiniteHint(max(self.rows, other.rows), max(self.cols, other.cols))
        return other + self

    @property
    def total(self) -> int | None:
        if self.rows >= 0 and self.cols >= 0:
            return self.rows * self.cols
        return None

    def set_cols(self, cols):
        return FiniteHint(self.rows, cols)

    def set_rows(self, rows):
        return FiniteHint(rows, self.cols)

    def set_cols_to_rows(self):
        return FiniteHint(self.rows, self.rows)

    def set_rows_to_cols(self):
        return FiniteHint(self.cols, self.cols)

    def transpose(self):
        return FiniteHint(self.cols, self.rows)


class SparseHint(SizeHintBase):
    """Bound with an occupancy fraction (SizeHint.scala:85-132): product
    sparsity is the birthday-style collision estimate
    ``min(1, cols · sp_a · sp_b)``; sum is inclusion-exclusion
    ``p + q − pq``."""

    def __init__(self, sparsity: float, rows: int = -1, cols: int = -1):
        self.sparsity = float(sparsity)
        self.rows = int(rows)
        self.cols = int(cols)

    def __mul__(self, other):
        if isinstance(other, NoClue):
            return NO_CLUE
        if isinstance(other, FiniteHint):
            return self * SparseHint(1.0, other.rows, other.cols)
        if self.cols < 0:
            # unknown inner dimension: the collision estimate needs cols —
            # a -1 here used to produce NEGATIVE sparsity/total, which the
            # strategy dispatch read as "tiny" and broadcast an unbounded
            # matrix. Unknown in → unknown out.
            return NO_CLUE
        new_sp = self.cols * self.sparsity * other.sparsity
        if new_sp >= 1.0:
            return FiniteHint(self.rows, other.cols)
        return SparseHint(new_sp, self.rows, other.cols)

    def __add__(self, other):
        if isinstance(other, NoClue):
            return NO_CLUE
        if isinstance(other, FiniteHint):
            return self + SparseHint(1.0, other.rows, other.cols)
        if self.sparsity == 1.0 or other.sparsity == 1.0:
            return FiniteHint(max(self.rows, other.rows), max(self.cols, other.cols))
        # inclusion-exclusion, clamped to its mathematical bounds: for reals
        # in [0,1], max(p,q) <= p+q-pq <= 1, but float rounding can land an
        # ulp outside either end (hypothesis-found: p=q=1-1e-16 sums BELOW p)
        new_sp = self.sparsity + other.sparsity - self.sparsity * other.sparsity
        new_sp = min(1.0, max(new_sp, self.sparsity, other.sparsity))
        return SparseHint(new_sp, max(self.rows, other.rows), max(self.cols, other.cols))

    @property
    def total(self) -> int | None:
        if self.rows >= 0 and self.cols >= 0:
            return int(self.rows * self.cols * self.sparsity)
        return None

    def set_cols(self, cols):
        return SparseHint(self.sparsity, self.rows, cols)

    def set_rows(self, rows):
        return SparseHint(self.sparsity, rows, self.cols)

    def set_cols_to_rows(self):
        return SparseHint(self.sparsity, self.rows, self.rows)

    def set_rows_to_cols(self):
        return SparseHint(self.sparsity, self.cols, self.cols)

    def transpose(self):
        return SparseHint(self.sparsity, self.cols, self.rows)


def as_diagonal(h: SizeHintBase) -> SizeHintBase:
    """Sparsity assuming only the diagonal is present
    (SizeHint.scala:21-34)."""
    if isinstance(h, NoClue) or h.total is None:
        return NO_CLUE
    max_elements = min(h.rows, h.cols)
    if max_elements <= 0:
        return NO_CLUE
    return SparseHint(1.0 / max_elements, max_elements, max_elements)


def SizeHint(rows: int | None = None, cols: int | None = None,
             sparsity: float = 1.0) -> SizeHintBase:
    """Compat factory keeping round-1 call sites working: no args → NoClue;
    dims with full occupancy → FiniteHint; fractional occupancy →
    SparseHint. ``None`` dims map to the reference's -1 (unknown)."""
    if rows is None and cols is None and sparsity >= 1.0:
        return NO_CLUE
    r = -1 if rows is None else rows
    c = -1 if cols is None else cols
    if sparsity >= 1.0:
        return FiniteHint(r, c)
    return SparseHint(sparsity, r, c)


def choose_product_strategy(left: SizeHintBase, right: SizeHintBase) -> str:
    """getJoiner (MatrixProduct.scala:90-104) re-expressed as Spark physical
    strategies: 'broadcast_left' / 'broadcast_right' ↔ TinyToAny/AnyToTiny
    replicated joins, 'shuffle' ↔ SmallToBig/BigToSmall cogroups (Catalyst +
    AQE then pick hash vs sort-merge and split skewed inner keys).

    Deliberate upgrade over the reference: its ordering-first dispatch never
    broadcasts a known-tiny side when the OTHER side is NoClue (NoClue sorts
    below everything, and only the "smaller" side's total is inspected) —
    here any side with a known expected count under MAX_TINY_JOIN is
    broadcast, preferring the smaller when both qualify."""
    tiny = [(t, name)
            for t, name in ((left.total, "broadcast_left"),
                            (right.total, "broadcast_right"))
            # 0 <= t: a negative expected count is a corrupted hint (e.g.
            # user-built SparseHint with negative sparsity) — never treat
            # garbage as "tiny enough to broadcast"
            if t is not None and 0 <= t < MAX_TINY_JOIN]
    if tiny:
        return min(tiny)[1]
    return "shuffle"


def _coo_product(a: DataFrame, b: DataFrame, strategy: str) -> DataFrame:
    """The shared A·B kernel over PRE-PROJECTED COO sides (ADVICE r11 #3:
    matmul and gram previously copy-pasted this body and could silently
    drift): join on the inner dim ``k``, multiply, partial-aggregated sum
    over (row, col), prune structural zeros. Sides arrive as
    (k, a_row, a_val) / (k, b_col, b_val) in whatever COLUMN ORDER the
    caller chose — gram projects both sides identically so the
    self-join's shuffle subtrees canonicalize and plan one Exchange +
    ReusedExchange; matmul's two distinct operands cannot reuse and use
    the generic projections."""
    if strategy == "broadcast_left":
        a = F.broadcast(a)
    elif strategy == "broadcast_right":
        b = F.broadcast(b)
    return (a.join(b, on="k")
            .groupBy(F.col("a_row").alias("row"),
                     F.col("b_col").alias("col"))
            .agg(F.sum(F.col("a_val") * F.col("b_val")).alias("val"))
            .where(F.col("val") != 0))


class Matrix:
    """Sparse matrix over a (row, col, val) DataFrame (Matrix.scala:184)."""

    def __init__(self, df: DataFrame, row: str = "row", col: str = "col",
                 val: str = "val", hint: SizeHint = SizeHint()):
        self.df = df.select(
            F.col(row).alias("row"), F.col(col).alias("col"), F.col(val).alias("val"))
        self.hint = hint

    # -- construction (Matrix.scala:54-142) --------------------------------

    @classmethod
    def from_df(cls, df: DataFrame, row: str, col: str, val: str,
                hint: SizeHint = SizeHint()) -> "Matrix":
        return cls(df, row, col, val, hint)

    # -- elementwise / structural (Matrix.scala:211-252,505-520) -----------

    def map_values(self, fn) -> "Matrix":
        """mapValues with zero-pruning (Matrix.scala:211-216,150-152)."""
        out = self.df.withColumn("val", fn(F.col("val"))).where(F.col("val") != 0)
        return Matrix(out, hint=self.hint)

    def filter_values(self, pred) -> "Matrix":
        return Matrix(self.df.where(pred(F.col("val"))), hint=self.hint)

    def map_with_index(self, fn) -> "Matrix":
        """mapWithIndex (Matrix.scala:218-229): ``fn(val, row, col) -> val``
        with zero-pruning."""
        out = (self.df.withColumn("val", fn(F.col("val"), F.col("row"), F.col("col")))
               .where(F.col("val") != 0))
        return Matrix(out, hint=self.hint)

    def binarize(self) -> "Matrix":
        """binarizeAs (Matrix.scala:231-241): nonzero → 1, zero STAYS zero
        (the reference maps through the boolean ring; an explicitly-stored
        0.0 entry must not become an edge) — zeros are pruned like
        map_values does."""
        return Matrix(self.df.where(F.col("val") != 0)
                      .withColumn("val", F.lit(1.0)), hint=self.hint)

    def transpose(self) -> "Matrix":
        return Matrix(
            self.df.select(F.col("col").alias("row"), F.col("row").alias("col"), "val"),
            hint=self.hint.transpose())

    def diagonal(self) -> "Matrix":
        """(Matrix.scala:505-520)."""
        return Matrix(self.df.where(F.col("row") == F.col("col")), hint=self.hint)

    def get_row(self, r) -> "Matrix":
        return Matrix(self.df.where(F.col("row") == r), hint=SizeHint(1, self.hint.cols))

    def get_col(self, c) -> "Matrix":
        return Matrix(self.df.where(F.col("col") == c), hint=SizeHint(self.hint.rows, 1))

    # -- reductions (Matrix.scala:255-272,395-401,496-503) -----------------

    def sum_row_vectors(self) -> DataFrame:
        """Sum over columns per row → (row, val)."""
        return self.df.groupBy("row").agg(F.sum("val").alias("val"))

    def sum_col_vectors(self) -> DataFrame:
        return self.df.groupBy("col").agg(F.sum("val").alias("val"))

    def trace(self) -> DataFrame:
        """(Matrix.scala:734-755)."""
        return self.df.where(F.col("row") == F.col("col")).agg(F.sum("val").alias("trace"))

    def total_sum(self) -> DataFrame:
        """Matrix.sum (Matrix.scala:496-503)."""
        return self.df.agg(F.sum("val").alias("sum"))

    # -- top-k (Matrix.scala:296-322) --------------------------------------

    def top_row_elems(self, k: int) -> "Matrix":
        """Top-k entries per row by value. The reference switches heap vs
        sort at k=1000 (Matrix.scala:297); the window-rank plan bounds
        per-partition state for any k."""
        w = Window.partitionBy("row").orderBy(F.col("val").desc(), F.col("col"))
        out = (self.df.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k).drop("__rn"))
        return Matrix(out, hint=self.hint)

    # -- normalizations (Matrix.scala:324-385) -----------------------------

    def row_l1_normalize(self) -> "Matrix":
        """Divide each row by its L1 norm — one window aggregation; no join,
        no second shuffle when the input is already partitioned by row."""
        w = Window.partitionBy("row")
        norm = F.sum(F.abs(F.col("val"))).over(w)
        return Matrix(self.df.withColumn("val", F.col("val") / norm), hint=self.hint)

    def row_l2_normalize(self) -> "Matrix":
        w = Window.partitionBy("row")
        norm = F.sqrt(F.sum(F.col("val") * F.col("val")).over(w))
        return Matrix(self.df.withColumn("val", F.col("val") / norm), hint=self.hint)

    def row_mean_centering(self) -> "Matrix":
        w = Window.partitionBy("row")
        return Matrix(self.df.withColumn("val", F.col("val") - F.avg("val").over(w)),
                      hint=self.hint)

    def row_l0_normalize(self) -> "Matrix":
        """Divide by the count of nonzero entries per row (L0 'norm')."""
        w = Window.partitionBy("row")
        return Matrix(self.df.withColumn("val", F.col("val") / F.count("val").over(w)),
                      hint=self.hint)

    def row_size_ave_stdev(self) -> DataFrame:
        """Per-row (size, mean, stdev) — Matrix.scala:370-385. One hash agg."""
        return self.df.groupBy("row").agg(
            F.count("val").alias("size"),
            F.avg("val").alias("mean"),
            F.coalesce(F.stddev_pop("val"), F.lit(0.0)).alias("stdev"))

    # Column-axis variants (Matrix.scala:395-430) — transpose symmetry.

    def col_l1_normalize(self) -> "Matrix":
        return self.transpose().row_l1_normalize().transpose()

    def col_l2_normalize(self) -> "Matrix":
        return self.transpose().row_l2_normalize().transpose()

    def col_mean_centering(self) -> "Matrix":
        return self.transpose().row_mean_centering().transpose()

    def col_size_ave_stdev(self) -> DataFrame:
        out = self.transpose().row_size_ave_stdev()
        return out.withColumnRenamed("row", "col")

    def top_col_elems(self, k: int) -> "Matrix":
        """Top-k entries per column (Matrix.scala:407-409)."""
        w = Window.partitionBy("col").orderBy(F.col("val").desc(), F.col("row"))
        out = (self.df.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= k).drop("__rn"))
        return Matrix(out, hint=self.hint)

    def map_rows(self, fn) -> "Matrix":
        """Whole-row transform (Matrix.scala:277-293): ``fn`` maps an
        ``array<struct<col,val>>`` Column to a same-shaped Column. Expression
        -only — one shuffle to assemble rows, explode back, zero-prune.

        For arbitrary Python row logic use ``map_rows_pandas``."""
        assembled = (self.df.groupBy("row")
                     .agg(F.collect_list(F.struct("col", "val")).alias("entries")))
        transformed = assembled.select("row", fn(F.col("entries")).alias("entries"))
        out = (transformed.select("row", F.explode("entries").alias("e"))
               .select("row", F.col("e.col").alias("col"), F.col("e.val").alias("val"))
               .where(F.col("val") != 0))
        return Matrix(out, hint=self.hint)

    def map_cols(self, fn) -> "Matrix":
        return self.transpose().map_rows(fn).transpose()

    def map_rows_pandas(self, fn, schema: str = "row long, col long, val double") -> "Matrix":
        """Whole-row transform with arbitrary Python logic via applyInPandas
        (the escape hatch the reference's Scala lambdas imply)."""
        out = self.df.groupBy("row").applyInPandas(fn, schema=schema)
        return Matrix(out.where(F.col("val") != 0), hint=self.hint)

    # -- elementwise algebra (Matrix.scala:449-480, zip :580-627) ----------

    def _elementwise(self, other: "Matrix", combine) -> "Matrix":
        """Full outer join on (row, col); absent entries are monoid zero
        (the reference's zip + Monoid.zero fill, Matrix.scala:544-554)."""
        a = self.df.alias("a")
        b = other.df.alias("b")
        joined = a.join(b, on=["row", "col"], how="full_outer")
        la = F.coalesce(F.col("a.val"), F.lit(0.0))
        rb = F.coalesce(F.col("b.val"), F.lit(0.0))
        out = (joined.select("row", "col", combine(la, rb).alias("val"))
               .where(F.col("val") != 0))
        # hint SUM algebra (SizeHint.scala:34-44): the union's bounds come
        # from BOTH operands — keeping only self.hint would let a tiny
        # left side mislabel (tiny + huge) as broadcastable
        return Matrix(out, hint=self.hint + other.hint)

    def __add__(self, other: "Matrix") -> "Matrix":
        return self._elementwise(other, lambda a, b: a + b)

    def __sub__(self, other: "Matrix") -> "Matrix":
        return self._elementwise(other, lambda a, b: a - b)

    def elem_wise_op(self, other: "Matrix", combine) -> "Matrix":
        """Generic elementwise combine with monoid-zero fill for absent
        entries (Matrix.scala:464-476 elemWiseOp)."""
        return self._elementwise(other, combine)

    def zip_matrix(self, other: "Matrix") -> DataFrame:
        """zip (Matrix.scala:580-627): pair up entries by (row, col) via full
        outer join, coalescing indices (Matrix.scala:544-554); absent side is
        monoid zero. Returns (row, col, val_left, val_right)."""
        a, b = self.df.alias("a"), other.df.alias("b")
        joined = a.join(b, on=["row", "col"], how="full_outer")
        return joined.select(
            "row", "col",
            F.coalesce(F.col("a.val"), F.lit(0.0)).alias("val_left"),
            F.coalesce(F.col("b.val"), F.lit(0.0)).alias("val_right"))

    def zip_col_vector(self, vec: DataFrame) -> DataFrame:
        """zip with a column vector keyed by row id (Matrix.scala:580-600):
        every matrix entry pairs with its row's vector value (zero when
        absent). Returns (row, col, val, vec_val)."""
        v = vec.select(F.col(vec.columns[0]).alias("row"),
                       F.col(vec.columns[1]).alias("vec_val"))
        return (self.df.join(v, on="row", how="left")
                .select("row", "col", "val",
                        F.coalesce(F.col("vec_val"), F.lit(0.0)).alias("vec_val")))

    def h_prod(self, other: "Matrix") -> "Matrix":
        """Hadamard product (Matrix.scala:478-480). Inner join suffices —
        zero × anything is zero (pruned)."""
        a, b = self.df.alias("a"), other.df.alias("b")
        out = (a.join(b, on=["row", "col"], how="inner")
               .select("row", "col", (F.col("a.val") * F.col("b.val")).alias("val")))
        return Matrix(out, hint=self.hint)

    def scale(self, s: float) -> "Matrix":
        """scalar·matrix (MatrixProduct.scala:110-284)."""
        return self.map_values(lambda v: v * s)

    def scale_by(self, scalar: DataFrame, divide: bool = False) -> "Matrix":
        """Pipe-derived scalar product/division (MatrixProduct.scala:145-165
        scalarPipeRight/LeftProduct; Matrix.scala:441-447 ``/``): the
        scalar is a COMPUTED one-row frame — ``trace()``, ``total_sum()``,
        a ``dot()`` — not a Python literal, so ``A / A.total_sum()``
        composes lazily without collecting anything to the driver.

        The reference's ``nonZerosWith`` is a crossWithTiny of the 1-row
        scalar pipe; here that is an explicit broadcast cross join, so the
        matrix side stays map-only (no shuffle at any scale). Contract:
        ``scalar`` has exactly one column and (like the reference's
        ``Scalar``) at most one row — aggregates without groupBy satisfy
        this by construction. A NULL or absent scalar (e.g. total_sum of
        an empty matrix) yields the empty matrix, matching zero-pruned
        map_values semantics.

        The at-most-one-row contract is ENFORCED, not just documented
        (ADVICE r07 #3): a multi-row "scalar" would silently cross-join
        into N entries per (row, col) — a corrupt COO with duplicate
        coordinates. The guard costs nothing at scale: ``limit(2)``
        stops the scan at the second row and the single-row aggregate
        raises via ``raise_error`` iff two rows were seen.
        """
        if len(scalar.columns) != 1:
            raise ValueError(
                f"scalar frame must have exactly one column, got "
                f"{scalar.columns} — select the scalar out first")
        guarded = (scalar.select(
                       F.col(scalar.columns[0]).cast("double").alias("__s"))
                   .limit(2)
                   .agg(F.min("__s").alias("__s"),
                        F.count(F.lit(1)).alias("__n"))
                   .select(F.when(F.col("__n") > 1, F.raise_error(F.lit(
                       "scale_by: scalar frame has more than one row — "
                       "aggregate it to a single row first (the reference's "
                       "Scalar is one value by construction)")))
                           .otherwise(F.col("__s")).alias("__s")))
        sc = F.broadcast(guarded)
        combined = (F.col("val") / F.col("__s")) if divide \
            else (F.col("val") * F.col("__s"))
        out = (self.df.crossJoin(sc).withColumn("val", combined)
               .drop("__s").where(F.col("val") != 0))
        return Matrix(out, hint=self.hint)

    def __mul__(self, other):
        """``A * x`` dispatch (Matrix.scala:432-434): Matrix → matmul,
        number → literal scale, 1-row DataFrame → pipe-scalar product."""
        if isinstance(other, Matrix):
            return self.matmul(other)
        if isinstance(other, (int, float)):
            return self.scale(float(other))
        if isinstance(other, DataFrame):
            return self.scale_by(other)
        return NotImplemented

    def __rmul__(self, other):
        # scalar products commute (scalarPipeLeftProduct)
        if isinstance(other, (int, float, DataFrame)):
            return self.__mul__(other)
        return NotImplemented

    def __truediv__(self, other):
        """``A / x`` (Matrix.scala:436-447): literal divisor is checked
        non-zero up front (field.assertNotZero parity); a pipe-derived
        divisor divides lazily (NULL/zero scalar → empty matrix)."""
        if isinstance(other, (int, float)):
            if other == 0:
                raise ZeroDivisionError("matrix / literal zero")
            return self.map_values(lambda v: v / F.lit(float(other)))
        if isinstance(other, DataFrame):
            return self.scale_by(other, divide=True)
        return NotImplemented

    # -- products (MatrixProduct.scala:340-377) ----------------------------

    def matmul(self, other: "Matrix") -> "Matrix":
        """A*B: join A.col == B.row → multiply → groupBy (A.row, B.col) sum.

        Physical strategy chosen from SizeHints (MatrixProduct.scala:86-108):
        an operand known to be under MAX_TINY_JOIN elements is broadcast, so
        the big side neither shuffles for the join nor for the partial
        aggregation's map side. Otherwise both sides hash-shuffle on the
        inner dimension and AQE balances skewed inner keys."""
        a = self.df.select(F.col("row").alias("a_row"), F.col("col").alias("k"),
                           F.col("val").alias("a_val"))
        b = other.df.select(F.col("row").alias("k"), F.col("col").alias("b_col"),
                            F.col("val").alias("b_val"))
        strategy = choose_product_strategy(self.hint, other.hint)
        out = _coo_product(a, b, strategy)
        return Matrix(out, hint=self.hint.times(other.hint))

    def persist(self) -> "Matrix":
        """Materialization barrier (forceToDisk parity, RichPipe.scala:428):
        cache the COO so multiple consumers don't recompute its lineage.
        Ledgered: ``session.release_materialized()`` frees it (a caller
        who never calls :meth:`unpersist` would otherwise leak a cache
        entry per matrix for the driver's lifetime — the r04 leak class).
        Session-cache note: a persisted COO is plan-matched by Catalyst,
        so any LATER identical plan silently reads this cache."""
        from scalding_spark.session import register_persisted
        self.df.persist()
        register_persisted(self.df)
        return self

    def unpersist(self) -> "Matrix":
        self.df.unpersist()
        return self

    def gram(self) -> "Matrix":
        """A·Aᵀ. Semantically identical to ``matmul(transpose())`` but the
        COO is materialized once first: transpose is just a column swap, yet
        Catalyst sees two distinct plans for the operands and would scan +
        aggregate the source twice (no exchange reuse across the rename).
        Persisting collapses that — measured 3.4s → 2.6s on the sf0.1
        supplier×part gram; at 100 TB it halves the dominant scan. The
        handle never reaches the caller, so it is LEDGERED
        (session.register_persisted) — release_materialized() frees it;
        without the ledger every gram() in a long-running driver leaks a
        cache entry (the r04 leak class).

        r11: the join is built directly (not via ``matmul(transpose())``)
        so BOTH sides project the same columns in the same order from the
        persisted COO — the inner dim is this matrix's ``col`` on either
        side of A·Aᵀ. The two join-side shuffle subtrees then canonicalize
        identically and the shuffle path plans ONE Exchange plus a
        ReusedExchange instead of two full COO shuffles (matmul's generic
        ``a_row,k,a_val`` / ``k,b_col,b_val`` projections differ in column
        order, which defeats reuse). The broadcast dispatch and every
        output value are unchanged (sums of the same operands; the
        supplier×part gram is integral-double-exact, order-free)."""
        from scalding_spark.session import register_persisted
        self.df.persist()
        register_persisted(self.df)
        t_hint = self.hint.transpose()
        strategy = choose_product_strategy(self.hint, t_hint)
        a = self.df.select(F.col("col").alias("k"), F.col("row").alias("a_row"),
                           F.col("val").alias("a_val"))
        b = self.df.select(F.col("col").alias("k"), F.col("row").alias("b_col"),
                           F.col("val").alias("b_val"))
        out = _coo_product(a, b, strategy)
        return Matrix(out, hint=self.hint.times(t_hint))

    def propagate(self, vec: DataFrame) -> DataFrame:
        """Graph message passing: (bool) matrix × col vector
        (Matrix.scala:485-492) — one PageRank-style step.
        ``vec`` has columns (row, val) keyed by this matrix's *col* ids."""
        v = vec.select(F.col("row").alias("k"), F.col("val").alias("v_val"))
        m = self.df.select("row", F.col("col").alias("k"), "val")
        return (m.join(v, on="k")
                .groupBy("row").agg(F.sum(F.col("val") * F.col("v_val")).alias("val")))

    # -- row/col filtering by another pipe (Matrix.scala:632-693) ----------

    def keep_rows_by(self, keys: DataFrame) -> "Matrix":
        """left_semi on row ids (the reference's join+null-filter idiom)."""
        k = keys.select(F.col(keys.columns[0]).alias("row"))
        return Matrix(self.df.join(F.broadcast(k), on="row", how="left_semi"), hint=self.hint)

    def remove_rows_by(self, keys: DataFrame) -> "Matrix":
        k = keys.select(F.col(keys.columns[0]).alias("row"))
        return Matrix(self.df.join(F.broadcast(k), on="row", how="left_anti"), hint=self.hint)

    def keep_cols_by(self, keys: DataFrame) -> "Matrix":
        """keepColsBy (Matrix.scala:652-662)."""
        k = keys.select(F.col(keys.columns[0]).alias("col"))
        return Matrix(self.df.join(F.broadcast(k), on="col", how="left_semi")
                      .select("row", "col", "val"), hint=self.hint)

    def remove_cols_by(self, keys: DataFrame) -> "Matrix":
        k = keys.select(F.col(keys.columns[0]).alias("col"))
        return Matrix(self.df.join(F.broadcast(k), on="col", how="left_anti")
                      .select("row", "col", "val"), hint=self.hint)

    def keep_elements_by(self, other: "Matrix") -> "Matrix":
        """keepElementsBy (Matrix.scala:632-640): keep entries whose (row,col)
        appears in the other matrix — left_semi on the composite key."""
        k = other.df.select("row", "col")
        return Matrix(self.df.join(k, on=["row", "col"], how="left_semi"), hint=self.hint)

    def remove_elements_by(self, other: "Matrix") -> "Matrix":
        """removeElementsBy (Matrix.scala:642-650)."""
        k = other.df.select("row", "col")
        return Matrix(self.df.join(k, on=["row", "col"], how="left_anti"), hint=self.hint)

    def row_cosine_similarity(self) -> "Matrix":
        """Pairwise cosine similarity between rows: L2-normalize then gram
        (the reference's matrix-API cosine example, MatrixTest.scala:29-259).
        Same join+agg plan as matmul; output entry (i,j) = cos(rowᵢ, rowⱼ)."""
        n = self.row_l2_normalize()
        return n.matmul(n.transpose())

    def diagonal_inverse(self) -> "Matrix":
        """DiagonalMatrix.inverse (Matrix.scala:734-755): 1/val on the
        diagonal, zero entries skipped (stay zero)."""
        return Matrix(
            self.df.where((F.col("row") == F.col("col")) & (F.col("val") != 0))
            .withColumn("val", F.lit(1.0) / F.col("val")),
            hint=self.hint)


# -- vectors (Matrix.scala:706-996) -----------------------------------------


class ColVector:
    """Sparse column vector as a (row, val) DataFrame (Matrix.scala:876-996)."""

    def __init__(self, df: DataFrame, row: str = "row", val: str = "val"):
        self.df = df.select(F.col(row).alias("row"), F.col(val).alias("val"))

    def transpose(self) -> "RowVector":
        return RowVector(self.df.select(F.col("row").alias("col"), "val"))

    def _scale_by_global(self, norm_agg) -> "ColVector":
        """Broadcast cross join of the 1-row norm — not an empty-partition
        window, which would funnel the whole vector through one task."""
        total = F.broadcast(self.df.agg(norm_agg.alias("__n")))
        return ColVector(self.df.crossJoin(total)
                         .withColumn("val", F.col("val") / F.col("__n"))
                         .drop("__n"))

    def l1_normalize(self) -> "ColVector":
        return self._scale_by_global(F.sum(F.abs(F.col("val"))))

    def l2_normalize(self) -> "ColVector":
        return self._scale_by_global(F.sqrt(F.sum(F.col("val") * F.col("val"))))

    def top_elems(self, k: int) -> "ColVector":
        """topElems (Matrix.scala:956-975): global top-k — Spark plans
        orderBy+limit as TakeOrderedAndProject (no single-reducer sort)."""
        return ColVector(self.df.orderBy(F.col("val").desc(), F.col("row")).limit(k))

    def scale(self, s: float) -> "ColVector":
        """literal scalar · col vector (MatrixProduct.scala:litScalarCol*)."""
        return ColVector(self.df.withColumn("val", F.col("val") * F.lit(float(s)))
                         .where(F.col("val") != 0))

    def scale_by(self, scalar: DataFrame, divide: bool = False) -> "ColVector":
        """Pipe-derived scalar · col vector (MatrixProduct.scala:
        scalarColRight/LeftProduct) — same broadcast-cross-join shape as
        :meth:`Matrix.scale_by`; e.g. ``v.scale_by(v.sum(), divide=True)``."""
        out = Matrix(self.df.select("row", F.lit(0).alias("col"), "val")) \
            .scale_by(scalar, divide=divide)
        return ColVector(out.df.select("row", "val"))

    def diag(self) -> Matrix:
        """Lift to a diagonal matrix (Matrix.scala:930-940)."""
        return Matrix(self.df.select(F.col("row"), F.col("row").alias("col"), "val"))

    def outer_product(self, row_vec: "RowVector") -> Matrix:
        """col ⊗ row outer product — a broadcast cross join; every (i,j) pair
        (MatrixProduct.scala:287-453)."""
        r = F.broadcast(row_vec.df.select(F.col("col"), F.col("val").alias("r_val")))
        out = (self.df.crossJoin(r)
               .select("row", "col", (F.col("val") * F.col("r_val")).alias("val"))
               .where(F.col("val") != 0))
        return Matrix(out)


class RowVector:
    """Sparse row vector as a (col, val) DataFrame (Matrix.scala:706-871)."""

    def __init__(self, df: DataFrame, col: str = "col", val: str = "val"):
        self.df = df.select(F.col(col).alias("col"), F.col(val).alias("val"))

    def transpose(self) -> ColVector:
        return ColVector(self.df.select(F.col("col").alias("row"), "val"))

    def dot(self, other: ColVector) -> DataFrame:
        """Inner product row·col → 1-row scalar DataFrame."""
        o = other.df.select(F.col("row").alias("col"), F.col("val").alias("o_val"))
        # coalesce: disjoint sparse supports give an EMPTY join, whose sum
        # is null — the sparse dot product there is 0, not null
        return (self.df.join(o, on="col")
                .agg(F.coalesce(F.sum(F.col("val") * F.col("o_val")),
                                F.lit(0.0)).alias("dot")))

    def times_matrix(self, m: Matrix) -> "RowVector":
        """row-vector × matrix (MatrixProduct.scala:287-340): broadcast the
        vector (it is one row), join on the matrix's row id, sum per col."""
        v = F.broadcast(self.df.select(F.col("col").alias("k"), F.col("val").alias("v_val")))
        md = m.df.select(F.col("row").alias("k"), "col", "val")
        out = (md.join(v, on="k")
               .groupBy("col").agg(F.sum(F.col("val") * F.col("v_val")).alias("val"))
               .where(F.col("val") != 0))
        return RowVector(out)

    def propagate(self, m: Matrix) -> "RowVector":
        """RowVector.propagate (Matrix.scala:820-823) = vector × bool matrix."""
        return self.times_matrix(m)

    def top_elems(self, k: int) -> "RowVector":
        return RowVector(self.df.orderBy(F.col("val").desc(), F.col("col")).limit(k))

    def scale(self, s: float) -> "RowVector":
        """literal scalar · row vector (MatrixProduct.scala:litScalarRow*)."""
        return RowVector(self.df.withColumn("val", F.col("val") * F.lit(float(s)))
                         .where(F.col("val") != 0))

    def scale_by(self, scalar: DataFrame, divide: bool = False) -> "RowVector":
        """Pipe-derived scalar · row vector (MatrixProduct.scala:
        scalarRowRight/LeftProduct): e.g. normalize a dot product —
        ``r.scale_by(r.dot(c), divide=True)``."""
        out = Matrix(self.df.select(F.lit(0).alias("row"), "col", "val")) \
            .scale_by(scalar, divide=divide)
        return RowVector(out.df.select("col", "val"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             alpha: float = 0.85, iterations: int = 10, n_nodes: int | None = None,
             weight: str | None = None) -> DataFrame:
    """Iterative PageRank on an edge list — the reference's examples/PageRank.scala:22-179
    expressed as a driver-side loop of DataFrame steps with persist() between
    iterations (Job.next chaining parity). Returns (node, rank).

    ``weight``: optional edge-weight column → WeightedPageRank
    (examples/WeightedPageRank.scala:28): each node's rank flows out
    proportionally to edge weight instead of 1/out-degree.

    Scale notes: the transition matrix is row-L1-normalized once and
    persisted; each iteration is one join + one aggregation on the same key
    partitioning. The reference caps ~10 iterations per flow
    (PageRank.scala:13-14) — same default here.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.cast("double").alias("w"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))).distinct().persist()
    n = n_nodes or nodes.count()
    if n == 0:
        # empty edge list (an empty upstream slice): no nodes, no ranks —
        # return the empty (node, rank) frame instead of dying at
        # expression-build time on 1/n
        out = nodes.select(F.col("node"), F.lit(0.0).alias("rank"))
        nodes.unpersist()
        return out
    deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    trans = (e.join(deg, on="src")
             .select(F.col("dst").alias("row"), F.col("src").alias("col"),
                     (F.col("w") / F.col("deg")).alias("val"))).persist()
    ranks = nodes.select(F.col("node").alias("row"), F.lit(1.0 / n).alias("val"))
    m = Matrix(trans)
    try:
        for _ in range(iterations):
            contrib = m.propagate(ranks)
            new_ranks = (nodes.join(contrib, nodes.node == contrib.row, "left")
                         .select(F.col("node").alias("row"),
                                 (F.lit((1 - alpha) / n)
                                  + F.lit(alpha) * F.coalesce(F.col("val"), F.lit(0.0))).alias("val")))
            # Eager localCheckpoint: materializes AND truncates lineage —
            # without it the logical plan doubles per iteration (exponential
            # analysis cost; driver OOM building plan strings past ~20
            # iterations).
            ranks = materialize(new_ranks, eager=True, iterative=True)
    finally:
        # the final ranks are EAGERLY materialized with lineage cut, so the
        # returned plan no longer references nodes/trans — release their
        # cache here (error path included) instead of leaking it for the
        # session's lifetime
        nodes.unpersist()
        trans.unpersist()
    return ranks.select(F.col("row").alias("node"), F.col("val").alias("rank"))
