"""Round-7 regression pins for the r06 ADVICE findings.

1. canonicalize_url no longer strips bare ``ref=`` (a resource selector
   on common origins — GitHub branches, API pagination), and the strip
   set is caller-tunable (behavior pins live in test_web_semantic_r06;
   here we pin the DEFAULT set's contract).
2. the example pipeline's URL-exact dedup computes min-doc_id per
   canonical via groupBy+join over NON-NULL canonicals only — never a
   whole-frame window that would funnel every unparseable URL into one
   task.
3. the --benchmark contamination sidecar materializes the gated corpus
   before its separate write action, so the upstream gates execute once,
   not once per action.
"""

import inspect

from pyspark.sql import functions as F

from scalding_spark.functions import web


# --- 1. default strip set ----------------------------------------------------

def test_default_tracking_params_exclude_bare_ref():
    assert "ref" not in web.DEFAULT_TRACKING_PARAMS
    assert "ref_src" in web.DEFAULT_TRACKING_PARAMS


def test_ref_variants_stay_distinct_dedup_keys(spark):
    """The ADVICE failure mode: distinct resources differing only in ref
    must NOT collapse to one canonical key."""
    urls = ["https://code.example.com/repo/tree?ref=main",
            "https://code.example.com/repo/tree?ref=dev"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    n = (df.select(web.canonicalize_url(F.col("url")).alias("c"))
         .distinct().count())
    assert n == 2


# --- 2. URL dedup: no whole-frame window, unparseable rows all kept ---------

def _build_source():
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    return inspect.getsource(PrepareTrainingDataJob.build)


def test_url_dedup_stage_has_no_window():
    src = _build_source()
    assert "Window.partitionBy" not in src, (
        "URL dedup must use groupBy+join over non-NULL canonicals, not a "
        "window over the whole frame (NULL-canonical hot spot)")
    assert 'where(F.col("__curl").isNotNull())' in src


def test_url_dedup_keeps_every_unparseable_row(spark, tmp_path):
    """A corpus that is MOSTLY unparseable URLs: every such row survives
    the URL-dedup gate; parseable duplicates still collapse to min doc_id."""
    from scalding_spark.job import Args
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    rows = [(i, f"not a url {i}", "the quick brown fox jumps over it "
             f"unique{i} text", "web", 40) for i in range(20)]
    rows += [(100, "https://dup.example.com/p?utm_source=a",
              "completely different content about spark engines alpha",
              "web", 50),
             (101, "HTTPS://DUP.EXAMPLE.COM:443/p",
              "completely different content about spark engines beta",
              "web", 50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string, source string, "
              "n_chars long")
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    docs.write.parquet(inp)
    PrepareTrainingDataJob(
        Args(["--input", inp, "--output", out, "--canonicalize-urls",
              "--min-quality", "0", "--min-model-score", "-100",
              "--jaccard", "0.99"]), spark).run()
    kept = {r.doc_id for r in
            spark.read.parquet(out).select("doc_id").collect()}
    assert set(range(20)) <= kept          # all unparseable rows kept
    assert 100 in kept and 101 not in kept  # canonical dupes -> min doc_id


# --- 3. contamination sidecar shares one computation -------------------------

def test_contamination_sidecar_materializes_first():
    src = _build_source()
    assert "docs = materialize(docs)" in src
    before, _, after = src.partition("docs = materialize(docs)")
    assert "contamination_report" not in before
    assert "contamination_report" in after, (
        "the sidecar write must run on the materialized frame so the "
        "upstream gates execute once, not once per action")


# --- 4. semantic_decontaminate benchmark-size circuit breaker ----------------

def test_semantic_decontaminate_benchmark_cap(spark):
    from scalding_spark.functions.similarity import semantic_decontaminate
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>")
    import pytest
    with pytest.raises(ValueError, match="max_benchmark"):
        semantic_decontaminate(corpus, bench, max_benchmark=5)
    # NULL-vector rows don't count against the cap (they never broadcast)
    bench_nulls = spark.createDataFrame(
        [(1, [0.0, 1.0])] + [(i, None) for i in range(2, 12)],
        "vec_id long, embedding array<double>")
    out = semantic_decontaminate(corpus, bench_nulls, max_benchmark=5)
    assert out.count() == 1
