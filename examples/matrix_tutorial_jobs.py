"""The reference's matrix tutorial series (tutorial/MatrixTutorial0-6.scala)
ported to the engine's COO Matrix API — graph degree, co-follows,
degree-filtered graphs, matrix intersection, cosine similarity, Jaccard
similarity, and matrix-form TF-IDF, each preserving the original's
composition. Naming note: the reference's ``sumColVectors`` sums the column
vectors into one per-ROW vector — our ``sum_row_vectors`` — and vice versa.

Run, e.g.:
    python -m scalding_spark.tool examples.matrix_tutorial_jobs.CofollowsJob \
        --input edges.tsv --output /tmp/cofollows
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.matrix import ColVector, Matrix
from scalding_spark.sources.files import tsv


def _adjacency(job: Job, key: str = "input") -> Matrix:
    edges = tsv(job.spark, job.args(key),
                schema="user1 long, user2 long, rel double")
    return Matrix.from_df(edges, "user1", "user2", "rel")


class GraphOutDegreeJob(Job):
    """MatrixTutorial0: out-degree per user (sumColVectors)."""

    def build(self) -> None:
        deg = _adjacency(self).sum_row_vectors()  # (row=user, val=degree)
        deg.write.mode("overwrite").option("sep", "\t").csv(self.args("output"))


class CofollowsJob(Job):
    """MatrixTutorial1: co-follow counts = A · Aᵀ."""

    def build(self) -> None:
        a = _adjacency(self)
        co = a.matmul(a.transpose())
        co.df.write.mode("overwrite").option("sep", "\t").csv(self.args("output"))


class FilterOutdegreeJob(Job):
    """MatrixTutorial2: keep only edges from users below a max out-degree —
    filterValues → binarize → diag → diag · A."""

    def build(self) -> None:
        a = _adjacency(self)
        max_deg = float(self.args("maxOutdegree"))
        keep = (ColVector(a.sum_row_vectors())
                .df.where(F.col("val") < max_deg)
                .withColumn("val", F.lit(1.0)))
        filtered = ColVector(keep).diag().matmul(a)
        filtered.df.write.mode("overwrite").option("sep", "\t").csv(self.args("output"))


class ComputeMatrixIntersectionJob(Job):
    """MatrixTutorial3: zip two graphs, 1.0 where both have an edge."""

    def build(self) -> None:
        a1, a2 = _adjacency(self, "input1"), _adjacency(self, "input2")
        inter = (a1.zip_matrix(a2)
                 .select("row", "col",
                         F.when((F.col("val_left") > 0) & (F.col("val_right") > 0),
                                1.0).otherwise(0.0).alias("val"))
                 .where(F.col("val") > 0))
        inter.write.mode("overwrite").option("sep", "\t").csv(self.args("intersection"))


class ComputeCosineJob(Job):
    """MatrixTutorial4: row-L2-normalize then A·Aᵀ = pairwise cosine."""

    def build(self) -> None:
        n = _adjacency(self).row_l2_normalize()
        cos = n.matmul(n.transpose())
        cos.df.write.mode("overwrite").option("sep", "\t").csv(self.args("output"))


class ComputeJaccardJob(Job):
    """MatrixTutorial5: |A∩B| / |A∪B| over follow sets — binarize,
    intersect via B·Bᵀ, union via per-row degrees, elementwise divide."""

    def build(self) -> None:
        b = _adjacency(self).binarize()
        inter = b.matmul(b.transpose())          # common follows
        deg = b.sum_row_vectors()                # per-user degree
        with_x = Matrix(inter.zip_col_vector(deg)
                        .select("row", "col", F.col("vec_val").alias("val")))
        d2 = deg.select(F.col("row").alias("col"), F.col("val").alias("cv"))
        with_y = Matrix(inter.df.join(d2, on="col")
                        .select("row", "col", F.col("cv").alias("val")))
        union = with_x + with_y - inter
        jac = (inter.zip_matrix(union)
               .where(F.col("val_right") > 0)
               .select("row", "col",
                       (F.col("val_left") / F.col("val_right")).alias("val")))
        jac.write.mode("overwrite").option("sep", "\t").csv(self.args("output"))


class TfIdfJob(Job):
    """MatrixTutorial6: doc-word counts × log2(1/normalized-doc-freq),
    top-N words per doc (hProd + topRowElems)."""

    def build(self) -> None:
        dw = tsv(self.spark, self.args("input"),
                 schema="doc long, word string, count double")
        m = Matrix.from_df(dw, "doc", "word", "count")
        doc_freq = m.binarize().sum_col_vectors()    # (col=word, val=df)
        total = F.broadcast(doc_freq.agg(F.sum("val").alias("__t")))
        idf = (doc_freq.crossJoin(total)
               .select("col", (F.log2(F.col("__t") / F.col("val"))).alias("idf")))
        tfidf = Matrix(m.df.join(idf, on="col")
                       .select("row", "col",
                               (F.col("val") * F.col("idf")).alias("val")))
        top = tfidf.top_row_elems(int(self.args("nrWords")))
        top.df.write.mode("overwrite").option("sep", "\t").csv(self.args("output"))
